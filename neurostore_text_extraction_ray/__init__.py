"""neurostore_text_extraction_ray — a Ray-Data-native document extraction engine.

A from-scratch rebuild of the data-processing capabilities of
``neurostuff/neurostore-text-extraction`` (reference snapshot at
``/root/reference``, studied for behavior only) on top of
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow
batches for stateless kernels, actor pools for stateful stages,
explicit url-hash partitioning, groupby-url dedup-then-extract, and
per-partition checkpoint manifests.

Layout
------
``functions/``  pure, deterministic kernels (HTML/JATS extraction,
                normalization, hashing, tokenization) — no Ray imports.
``stages/``     Ray Data stages: callable actor classes / batch fns.
``sources/``    input synthesis + parquet readers.
``pipelines/``  end-to-end pipelines and the operator registry.
``state/``      checkpoint manifests and resume logic.
"""

__version__ = "0.1.0"
