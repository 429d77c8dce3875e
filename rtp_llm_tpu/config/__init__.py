from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.config.engine_config import (
    CacheConfig,
    EngineConfig,
    ParallelConfig,
    QuantConfig,
    QuantMethod,
    SchedulerConfig,
    ServerConfig,
)
from rtp_llm_tpu.config.generate_config import GenerateConfig

__all__ = [
    "ModelConfig",
    "CacheConfig",
    "EngineConfig",
    "ParallelConfig",
    "QuantConfig",
    "QuantMethod",
    "SchedulerConfig",
    "ServerConfig",
    "GenerateConfig",
]
