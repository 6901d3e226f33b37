from tpu_flash.serving.engine import Engine, Request, EngineConfig
from tpu_flash.serving.supervisor import Supervisor, SupervisorConfig
