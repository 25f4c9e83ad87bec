"""Embedding stage (SURVEY T3/M13): paragraph chunking + per-chunk
embedding + mean pool, as an actor-pool ``map_batches`` stage.

Chunking parity (reference ``api.py:217-242`` with tiktoken/spaCy
replaced by the BPE-ish regex tokenizer and a regex sentence splitter):
split on blank lines; a paragraph within [MIN, MAX] tokens is one
chunk; longer paragraphs are sentence-split and greedily packed to
MAX; chunks under MIN tokens are dropped.

The embedding client is injectable; the default is a DETERMINISTIC
fake (seeded from a content hash) standing in for the remote API the
reference calls (``api.py:187-280``) — same actor interface, no
network. Output column ``embedding`` is a fixed-size float32 list.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from ..functions.textstats import BPEISH_RE

MAX_TOKENS = 8192
MINIMUM_CHUNK_SIZE = 5

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _ntokens(s: str) -> int:
    return len(BPEISH_RE.findall(s))


def chunk_text(text: str, max_tokens: int = MAX_TOKENS,
               min_tokens: int = MINIMUM_CHUNK_SIZE) -> list[str]:
    """Paragraph/sentence chunker (api.py:217-242 semantics)."""
    chunks: list[str] = []
    for paragraph in (text or "").split("\n\n"):
        n = _ntokens(paragraph)
        if n < min_tokens:
            continue
        if n <= max_tokens:
            chunks.append(paragraph)
            continue
        packed: list[str] = []
        current = ""
        for sent in _SENT_RE.split(paragraph):
            test = current + " " + sent if current else sent
            if _ntokens(test) <= max_tokens:
                current = test
            else:
                if current:
                    packed.append(current.strip())
                current = sent
        if current:
            packed.append(current.strip())
        # min-token filter applies to the freshly packed chunks only —
        # earlier chunks already satisfy it by construction (re-scanning
        # the whole accumulator here was O(n^2) in paragraphs-per-doc)
        chunks += [c for c in packed if _ntokens(c) >= min_tokens]
    return chunks


class FakeEmbeddingClient:
    """Deterministic stand-in for an embeddings API: vector = unit-norm
    gaussian seeded by the chunk's content hash. Similar texts do NOT
    get similar vectors (it's a fake) — tests rely only on determinism
    and shape."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=4).digest(), "little"
            )
            v = np.random.RandomState(seed).standard_normal(self.dim)
            out[i] = (v / np.linalg.norm(v)).astype(np.float32)
        return out


class EmbedActor:
    """map_batches actor: chunk -> embed (batched within the actor) ->
    mean pool (api.py:275-278) -> one vector per document."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 dim: int = 64, client=None):
        self.text_column = text_column
        self.id_column = id_column
        self.dim = dim
        self.client = client if client is not None else FakeEmbeddingClient(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        texts = batch[self.text_column].to_pylist()
        doc_chunks = [chunk_text(t or "") for t in texts]
        flat = [c for cl in doc_chunks for c in cl]
        vecs = self.client.embed(flat) if flat else np.zeros((0, self.dim), np.float32)
        out = np.zeros((len(ids), self.dim), dtype=np.float32)
        pos = 0
        for i, cl in enumerate(doc_chunks):
            if cl:
                out[i] = vecs[pos : pos + len(cl)].mean(axis=0)
                pos += len(cl)
        return pa.table({
            self.id_column: batch[self.id_column],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1), pa.float32()), self.dim
            ),
            "n_chunks": pa.array([len(c) for c in doc_chunks], pa.int32()),
        })


def embed_documents(ds, text_column: str = "text", id_column: str = "doc_id",
                    dim: int = 64, concurrency=(2, 8), batch_size: int = 128):
    return ds.map_batches(
        EmbedActor,
        fn_constructor_kwargs={
            "text_column": text_column, "id_column": id_column, "dim": dim,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
