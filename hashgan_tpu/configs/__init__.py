from hashgan_tpu.configs.config import (  # noqa: F401
    Config,
    DataConfig,
    EncoderConfig,
    EvalConfig,
    GanConfig,
    HashLossConfig,
    IndexConfig,
    MeshConfig,
    TrainConfig,
    get_config,
    list_presets,
    load_yaml,
)
