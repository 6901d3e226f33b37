from tpu_flash.serving.engine import (
    Engine,
    EngineConfig,
    FinishedRequest,
    Request,
)
from tpu_flash.serving.checkpoint import load_checkpoint, save_checkpoint
from tpu_flash.serving.prefix_cache import PrefixCache
from tpu_flash.serving.seq_engine import SeqShardedEngine
from tpu_flash.serving.supervisor import Supervisor, SupervisorConfig
