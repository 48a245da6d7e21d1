"""TPU Pallas kernels (imported lazily from ops dispatchers)."""
