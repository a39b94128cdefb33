from imm_tpu.utils.config import ExperimentConfig, load_config, save_config

__all__ = ["ExperimentConfig", "load_config", "save_config"]
