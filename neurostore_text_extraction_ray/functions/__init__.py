"""Pure deterministic kernels. No Ray imports here — these run inside
``map_batches`` workers and in unit tests without a cluster."""
