"""Entity candidate linker (SURVEY T4/K1; reference
``umls_disease/model.py:113-273``): a character-n-gram TF-IDF index
over a knowledge-base of terms, held once per actor, generating
ranked candidates per mention.

The reference uses scispacy's UMLS ``CandidateGenerator`` (char-3gram
TF-IDF + ANN over the UMLS KB) with k=30 neighbors, similarity
threshold 0.5, a 0.95 short-circuit, and top
``max_entities_per_mention=5`` per mention (model.py:233-273). This
rebuild keeps those exact thresholds and ranking semantics over an
in-repo disease lexicon (UMLS itself is not redistributable); the KB
is injectable.

Index shape: dictionary terms -> l2-normalized char-3gram TF-IDF
matrix (dense; KBs of 1e4-1e5 terms fit comfortably); per-mention
scoring is one vector-matrix product. At larger KB scale the matrix
shards across actors (same interface).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.textstats import char_ngrams

# Small built-in disease/condition lexicon (public terminology).
DEFAULT_KB = {
    "C0011570": ["major depressive disorder", "major depression", "depression"],
    "C0003469": ["anxiety disorder", "anxiety"],
    "C0036341": ["schizophrenia"],
    "C0005586": ["bipolar disorder", "bipolar"],
    "C0038436": ["post-traumatic stress disorder", "ptsd",
                 "posttraumatic stress disorder"],
    "C0030567": ["parkinson disease", "parkinson's disease"],
    "C0002395": ["alzheimer disease", "alzheimer's disease", "alzheimers"],
    "C0014544": ["epilepsy"],
    "C0026769": ["multiple sclerosis"],
    "C1263846": ["attention deficit hyperactivity disorder", "adhd"],
    "C0004352": ["autism spectrum disorder", "autism"],
    "C0033975": ["psychosis", "psychotic disorder"],
    "C0600427": ["cocaine dependence", "cocaine use disorder"],
    "C0001973": ["alcohol use disorder", "alcoholism", "alcohol dependence"],
    "C0028043": ["nicotine dependence", "smoking"],
}


class CandidateIndex:
    """Char-3gram TF-IDF index over (cui, alias) pairs."""

    def __init__(self, kb: dict[str, list[str]] | None = None, n: int = 3):
        kb = kb if kb is not None else DEFAULT_KB
        self.n = n
        self.aliases: list[tuple[str, str]] = [
            (cui, alias) for cui, names in kb.items() for alias in names
        ]
        vocab: dict[str, int] = {}
        doc_grams = []
        for _, alias in self.aliases:
            grams = char_ngrams(alias, n)
            doc_grams.append(grams)
            for g in set(grams):
                vocab.setdefault(g, len(vocab))
        self.vocab = vocab
        n_docs = len(doc_grams)
        df = np.zeros(len(vocab))
        for grams in doc_grams:
            for g in set(grams):
                df[vocab[g]] += 1
        self.idf = np.log((1 + n_docs) / (1 + df)) + 1.0
        mat = np.zeros((n_docs, len(vocab)))
        for i, grams in enumerate(doc_grams):
            for g in grams:
                mat[i, vocab[g]] += 1
        mat *= self.idf
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.matrix = mat / norms

    def _vec(self, mention: str) -> np.ndarray:
        v = np.zeros(len(self.vocab))
        for g in char_ngrams(mention, self.n):
            j = self.vocab.get(g)
            if j is not None:
                v[j] += 1
        v *= self.idf
        nrm = np.linalg.norm(v)
        return v / nrm if nrm else v

    def candidates(
        self,
        mention: str,
        k: int = 30,
        threshold: float = 0.5,
        high_confidence: float = 0.95,
        max_entities: int = 5,
    ) -> list[dict]:
        """Ranked candidates (reference thresholds: k=30 neighbors,
        keep >= 0.5, 0.95 counts as high-confidence exact-ish match,
        top-5 per mention sorted by probability desc —
        umls_disease/model.py:233-273 / K1)."""
        if not mention or not mention.strip():
            return []
        sims = self.matrix @ self._vec(mention.lower())
        order = np.argsort(-sims)[:k]
        best_per_cui: dict[str, dict] = {}
        for i in order:
            score = float(sims[i])
            if score < threshold:
                continue
            cui, alias = self.aliases[i]
            cur = best_per_cui.get(cui)
            if cur is None or score > cur["umls_prob"]:
                best_per_cui[cui] = {
                    "umls_cui": cui,
                    "umls_name": alias,
                    "umls_prob": round(score, 6),
                    "high_confidence": score >= high_confidence,
                }
        ranked = sorted(
            best_per_cui.values(), key=lambda d: (-d["umls_prob"], d["umls_cui"])
        )
        return ranked[:max_entities]


ENTITY_TYPE = pa.list_(pa.struct([
    ("mention", pa.string()),
    ("umls_cui", pa.string()),
    ("umls_name", pa.string()),
    ("umls_prob", pa.float64()),
]))


def resolve_mention(target: str, abbreviations: list[dict],
                    start_char: int | None = None,
                    end_char: int | None = None) -> str:
    """Abbreviation-aware mention expansion
    (``umls_disease/model.py:214-231`` parity): each abbreviation whose
    short form appears in ``target`` is expanded; when a positional
    (start_char, end_char) window is given, only abbreviations whose
    short-form span lies inside the window apply. (The reference reads
    ``abrv['start_char']`` but its serializer emits ``short_start`` —
    the window branch is unreachable in its main path — so the span
    keys here follow the serializer, ``model.py:41-64``.)"""
    for abrv in abbreviations:
        if abrv["short_text"] in target:
            if start_char is not None and end_char is not None:
                if not (abrv["short_start"] >= start_char
                        and abrv["short_end"] <= end_char):
                    continue
            target = target.replace(abrv["short_text"], abrv["long_text"])
    return target


UMLS_ENTITIES_TYPE = pa.list_(pa.struct([
    ("umls_cui", pa.string()),
    ("umls_name", pa.string()),
    ("umls_prob", pa.float64()),
]))
# Mirror of UMLSDiseaseSchema (umls_disease/model.py:16-36): pmid,
# resolved diagnosis, entities, count, group_ix, start/end char.
LINKED_GROUPS_TYPE = pa.list_(pa.struct([
    ("pmid", pa.int64()),
    ("diagnosis", pa.string()),
    ("umls_entities", UMLS_ENTITIES_TYPE),
    ("count", pa.float64()),
    ("group_ix", pa.int32()),
    ("start_char", pa.int32()),
    ("end_char", pa.int32()),
]))


class PositionalLinkActor:
    """UMLS-disease positional pipeline parity
    (``umls_disease/model.py:289-319``): per document, detect
    abbreviations ONCE from the source text, expand each demographics
    group's diagnosis mention (optionally windowed by positional
    offsets), link the RESOLVED mention, and emit
    UMLSDiseaseSchema-shaped rows (groups with no entities are
    dropped, ``model.py:306-317``)."""

    def __init__(self, kb=None, groups_column: str = "groups",
                 text_column: str = "text", id_column: str = "doc_id",
                 max_entities: int = 5):
        from ..functions.normalize import detect_abbreviations

        self._detect = detect_abbreviations
        self.index = CandidateIndex(kb)
        self.groups_column = groups_column
        self.text_column = text_column
        self.id_column = id_column
        self.max_entities = max_entities

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = (
            batch[self.text_column].to_pylist()
            if self.text_column in batch.column_names
            else [None] * batch.num_rows
        )
        out = []
        for groups, text in zip(batch[self.groups_column].to_pylist(), texts):
            abbrevs = self._detect(text) if text else []
            rows = []
            for gix, g in enumerate(groups or []):
                diag = (g or {}).get("diagnosis")
                if not diag:
                    continue
                start = (g or {}).get("diagnosis_start")
                end = (g or {}).get("diagnosis_end")
                resolved = resolve_mention(diag, abbrevs, start, end)
                ents = self.index.candidates(resolved, max_entities=self.max_entities)
                if not ents:
                    continue
                rows.append({
                    "pmid": 0,  # model.py:308 — not critical for extraction
                    "diagnosis": resolved,
                    "umls_entities": [
                        {"umls_cui": e["umls_cui"], "umls_name": e["umls_name"],
                         "umls_prob": e["umls_prob"]} for e in ents
                    ],
                    "count": (g or {}).get("count"),
                    "group_ix": gix,
                    "start_char": start,
                    "end_char": end,
                })
            out.append(rows)
        return pa.table({
            self.id_column: batch[self.id_column],
            "linked_groups": pa.array(out, LINKED_GROUPS_TYPE),
        })


class LinkActor:
    """map_batches actor: link the ``diagnosis`` of each demographics
    group (upstream-pipeline input, J1) to KB candidates. The index is
    built once per actor (T4 pattern: compiled index in __init__)."""

    def __init__(self, kb=None, groups_column: str = "groups",
                 id_column: str = "doc_id", max_entities: int = 5):
        self.index = CandidateIndex(kb)
        self.groups_column = groups_column
        self.id_column = id_column
        self.max_entities = max_entities

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for groups in batch[self.groups_column].to_pylist():
            ents = []
            for g in groups or []:
                diag = (g or {}).get("diagnosis")
                if not diag:
                    continue
                for c in self.index.candidates(diag, max_entities=self.max_entities):
                    ents.append({
                        "mention": diag,
                        "umls_cui": c["umls_cui"],
                        "umls_name": c["umls_name"],
                        "umls_prob": c["umls_prob"],
                    })
            out.append(ents)
        return pa.table({
            self.id_column: batch[self.id_column],
            "entities": pa.array(out, ENTITY_TYPE),
        })
