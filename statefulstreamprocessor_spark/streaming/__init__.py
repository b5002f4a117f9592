from .stateful_join import streaming_nn_join
from .sink import IdempotentBatchSink

__all__ = ["streaming_nn_join", "IdempotentBatchSink"]
