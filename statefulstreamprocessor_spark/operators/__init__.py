from .nn_join import nn_join
from .replay_join import replay_join

__all__ = ["nn_join", "replay_join"]
