from .defaults import (
    Config,
    BackboneConfig,
    DatasetsConfig,
    HeadConfig,
    InputConfig,
    ModelConfig,
    SolverConfig,
    TestConfig,
    default_config,
    dgde_run_config,
    load_yaml_config,
    TYPE_ID_CONVERSION,
)

__all__ = [
    "Config",
    "BackboneConfig",
    "DatasetsConfig",
    "HeadConfig",
    "InputConfig",
    "ModelConfig",
    "SolverConfig",
    "TestConfig",
    "default_config",
    "dgde_run_config",
    "load_yaml_config",
    "TYPE_ID_CONVERSION",
]
