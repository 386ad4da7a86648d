from .dropout import tpu_dropout

__all__ = ["tpu_dropout"]
