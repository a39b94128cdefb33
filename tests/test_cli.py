"""CLI entry points exercised in-process (train / eval / generate)."""

import numpy as np


def test_train_cli(tmp_path):
    from imm_tpu.cli.train import main

    state = main(
        [
            "--preset", "tiny_cpu",
            "--steps", "3",
            "--workdir", str(tmp_path / "run"),
        ]
    )
    assert int(state.step) == 3


def test_eval_cli(tmp_path):
    from imm_tpu.cli.eval import main

    results = main(["--preset", "tiny_cpu", "--workdir", str(tmp_path / "r")])
    assert "landmark_error_test_pct" in results


def test_generate_cli(tmp_path):
    from imm_tpu.cli.generate import main

    out_path = str(tmp_path / "swaps.npy")
    out = main(
        ["--preset", "tiny_cpu", "--n", "2", "--out", out_path]
    )
    assert out.shape == (2, 32, 32, 3)
    saved = np.load(out_path)
    assert saved.shape == (2, 32, 32, 3)
    assert np.isfinite(saved).all()


def test_override_via_cli(tmp_path):
    from imm_tpu.cli.train import main

    state = main(
        [
            "--preset", "tiny_cpu",
            "--steps", "1",
            "train.batch_size=4",
        ]
    )
    assert int(state.step) == 1


def test_generate_swap_preset_works_without_dataset(tmp_path):
    """Driver config 5 (the README quick-start line): pose-swap generation
    must not require the CelebA tree on disk (inference-only wiring)."""
    from imm_tpu.cli.generate import main

    out_path = str(tmp_path / "sw.npy")
    out = main(
        [
            "--preset", "swap",
            "--n", "1",
            "--out", out_path,
            # shrink the model so the smoke test stays fast on CPU
            "model.image_size=32",
            "model.filters=[8,8,16,16]",
            "model.strides=[1,2,1,2]",
            "model.decoder_filters=[16,8,8]",
            "model.n_landmarks=4",
            "model.compute_dtype=float32",
        ]
    )
    assert out.shape == (1, 32, 32, 3)


def test_supervise_runs_to_completion(tmp_path):
    """--supervise wraps training in a restart loop; a healthy run exits 0."""
    import pytest

    from imm_tpu.cli.train import _strip_supervise, main

    assert _strip_supervise(["--supervise", "3", "--steps", "2"]) == ["--steps", "2"]
    assert _strip_supervise(["--supervise=3", "x"]) == ["x"]

    with pytest.raises(SystemExit) as exc:
        main(
            [
                "--preset", "tiny_cpu",
                "--steps", "2",
                "--workdir", str(tmp_path / "sv"),
                "--supervise", "1",
                "--platform", "cpu",
            ]
        )
    assert exc.value.code == 0

    with pytest.raises(SystemExit):
        main(["--preset", "tiny_cpu", "--supervise", "1"])  # no workdir


def test_generate_cli_ema_flag(tmp_path):
    """--ema uses the Polyak params; errors clearly when absent."""
    import pytest

    from imm_tpu.cli.generate import main as generate
    from imm_tpu.cli.train import main as train

    wd = str(tmp_path / "run")
    train(
        [
            "--preset", "tiny_cpu",
            "--steps", "3",
            "--workdir", wd,
            "train.param_ema_decay=0.5",
        ]
    )
    # deliberately does NOT replay the param_ema_decay override: the restore
    # layer reconciles the checkpoint's ema_params node against the default
    # config (the natural `generate --ema --workdir wd` UX)
    out = generate(
        ["--preset", "tiny_cpu", "--n", "2", "--ema",
         "--out", str(tmp_path / "s.npy"), "--workdir", wd]
    )
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()

    # without EMA in the checkpoint the flag must fail loudly
    wd2 = str(tmp_path / "run2")
    train(["--preset", "tiny_cpu", "--steps", "2", "--workdir", wd2])
    with pytest.raises(SystemExit):
        generate(
            ["--preset", "tiny_cpu", "--n", "2", "--ema",
             "--out", str(tmp_path / "s2.npy"), "--workdir", wd2]
        )
