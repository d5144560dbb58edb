from .native import NativeRingBuffer, SamplePipeRx, SamplePipeTx, TtiClock
