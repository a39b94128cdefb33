"""Data pipelines: pair synthesis + dataset loaders.

TPU-first split of responsibilities (SURVEY.md §7 step 4): the host only
decodes/crops/resizes frames; all deformation-pair synthesis (TPS warps, color
jitter) runs on device inside the jitted step (``pairs.py``). The synthetic
blob-face generator (``synthetic.py``) needs no files at all and is the
offline stand-in for CelebA/AFLW/cats/H36M (loaders in ``datasets.py``,
file-gated since no datasets ship with this machine).
"""

from imm_tpu.data.pairs import PairConfig, PairSynthesizer
from imm_tpu.data.synthetic import SyntheticBlobFaces
from imm_tpu.data.datasets import (
    DatasetSpec,
    get_dataset,
    CelebADataset,
    AFLWDataset,
    CatHeadsDataset,
    Human36MDataset,
)

__all__ = [
    "PairConfig",
    "PairSynthesizer",
    "SyntheticBlobFaces",
    "DatasetSpec",
    "get_dataset",
    "CelebADataset",
    "AFLWDataset",
    "CatHeadsDataset",
    "Human36MDataset",
]
