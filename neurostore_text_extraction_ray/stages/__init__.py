"""Ray Data stages: callable actor classes and vectorized batch
functions, wired into Dataset pipelines by ``pipelines/``."""
