from tpu_flash.serving.engine import Engine, Request, EngineConfig
