"""Text-analysis + hashing kernels."""

import numpy as np

from neurostore_text_extraction_ray.functions.hashing import (
    config_hash,
    hamming64,
    jaccard,
    lsh_band_keys,
    md5_text,
    minhash_params,
    minhash_signature,
    simhash64,
)
from neurostore_text_extraction_ray.functions.textstats import (
    fingerprint64,
    lang_id,
    quality_features,
    shingles,
    token_count,
    word_count,
)


def test_word_count_reference_semantics():
    assert word_count("one two  three\nfour") == 4
    assert word_count("") == 0
    assert word_count(None) == 0
    assert word_count("   ") == 0


def test_token_count():
    assert token_count("Hello, world!") >= 3
    assert token_count(None) == 0


def test_lang_id():
    en = "The results of the study are presented in the following table."
    de = "Die Ergebnisse der Studie sind in der folgenden Tabelle mit den Werten."
    assert lang_id(en)[0] == "en"
    assert lang_id(de)[0] == "de"
    assert lang_id("")[0] == "und"
    assert lang_id("xyzzy plugh")[0] == "und"


def test_quality_features():
    q = quality_features("The quick brown fox jumps over the lazy dog near the river bank.")
    assert q["n_words"] == 13
    assert 0 < q["quality_score"] <= 1
    assert quality_features(None)["quality_score"] == 0.0


def test_fingerprint_deterministic_and_whitespace_normalized():
    a = fingerprint64("Hello   world")
    b = fingerprint64("hello world")
    assert a == b
    assert fingerprint64("hello world!") != a


def test_shingles():
    s = shingles("a b c d e f", k=5)
    assert s == ["a b c d e", "b c d e f"]
    assert shingles("a b", k=5) == ["a b"]
    assert shingles("", k=5) == []


def test_md5_and_config_hash():
    assert md5_text("abc") == "900150983cd24fb0d6963f7d28e17f72"
    h = config_hash({"b": 1, "a": 2})
    assert len(h) == 12
    assert h == config_hash({"a": 2, "b": 1})  # order-insensitive
    assert h != config_hash({"a": 2, "b": 2})


def test_minhash_similarity_tracks_jaccard():
    a, b = minhash_params(128)
    s1 = set(shingles("the cat sat on the mat and looked at the dog outside", k=3))
    s2 = set(shingles("the cat sat on the mat and looked at the cat outside", k=3))
    s3 = set(shingles("completely different words appear in this unrelated text here", k=3))
    m1 = minhash_signature(list(s1), a, b)
    m2 = minhash_signature(list(s2), a, b)
    m3 = minhash_signature(list(s3), a, b)
    est12 = (m1 == m2).mean()
    est13 = (m1 == m3).mean()
    true12 = jaccard(s1, s2)
    assert abs(est12 - true12) < 0.2
    assert est13 < 0.1
    # identical docs -> identical signatures and identical band keys
    assert (m1 == minhash_signature(list(s1), a, b)).all()
    assert lsh_band_keys(m1, 16) == lsh_band_keys(m1.copy(), 16)


def test_simhash_near_duplicates_close():
    t1 = "the quick brown fox jumps over the lazy dog " * 5
    t2 = t1.replace("lazy", "sleepy")
    t3 = "entirely different content about ray data pipelines and arrow batches " * 5
    h1, h2, h3 = (simhash64(t.split()) for t in (t1, t2, t3))
    assert hamming64(h1, h2) < hamming64(h1, h3)
    assert hamming64(h1, h1) == 0


def test_jaccard():
    assert jaccard(set(), set()) == 1.0
    assert jaccard({1, 2}, {2, 3}) == 1 / 3


def test_batch_kernels_match_scalar():
    """Exact-equality contract for the vectorized batch kernels
    (SQL oracles / goldens depend on it): real corpus + edge cases."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from neurostore_text_extraction_ray.functions.textstats import (
        lang_id, lang_id_batch, quality_features, quality_features_batch,
        token_count, token_count_batch, word_count, word_count_batch)

    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet")["text"].to_pylist()
    texts = texts[:200] + [
        None, "", "   ", "a", "the the the", "½ Ω_ß ’quoted’ __x__",
        "der die das und in den von zu", "¡Hola! ¿qué tal?",
        "word nbsp\ttab\nnewline", "123 456 ...!!!",
    ]
    s = pd.Series(texts)
    assert word_count_batch(s).tolist() == [word_count(t) for t in texts]
    assert token_count_batch(s).tolist() == [token_count(t) for t in texts]
    langs, confs = lang_id_batch(s)
    expect = [lang_id(t) for t in texts]
    assert langs.tolist() == [e[0] for e in expect]
    assert confs.tolist() == [e[1] for e in expect]
    qb = quality_features_batch(s)
    qs = pd.DataFrame([quality_features(t) for t in texts])
    for col in qs.columns:
        np.testing.assert_array_equal(
            qb[col].to_numpy(), qs[col].to_numpy(), err_msg=col)


def test_repetition_frame_edge_shapes():
    """docs_repetition_stats kernel: empty/null/one-token/all-same
    edge cases (the SQL oracle's coalesce-0 semantics)."""
    import pandas as pd

    from neurostore_text_extraction_ray.pipelines.steps import _repetition_frame

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [None, "", "word", "the the the", "a b a b a b",
                 "all distinct tokens here now"],
    })
    out = _repetition_frame(df).set_index("doc_id")
    assert out.loc[1].tolist() == [0, 0.0, 0.0, 0.0]
    assert out.loc[2].tolist() == [0, 0.0, 0.0, 0.0]
    assert out.loc[3].tolist() == [1, 1.0, 0.0, 0.0]  # no bigram
    assert out.loc[4].tolist() == [3, 1.0, round(2 / 3, 6), 1.0]
    # "a b a b a b": 6 tokens, top word 3/6, dup (6-2)/6, bigram
    # "a b" occurs 3 of 5 -> 0.6
    assert out.loc[5].tolist() == [6, 0.5, round(4 / 6, 6), 0.6]
    assert out.loc[6].tolist() == [5, 0.2, 0.0, 0.25]


def test_char_entropy_edges():
    import math

    from neurostore_text_extraction_ray.functions.textstats import char_entropy

    assert char_entropy("") == 0.0
    assert char_entropy(None) == 0.0
    assert char_entropy("aaaa") == 0.0                       # one symbol
    assert abs(char_entropy("abab") - 1.0) < 1e-12           # two equal
    assert abs(char_entropy("abcdabcd") - 2.0) < 1e-12       # four equal
    # uniform over k distinct chars -> log2(k)
    assert abs(char_entropy("abcdefgh") - 3.0) < 1e-12
    # unicode counts by codepoint, not byte
    assert char_entropy("éé") == 0.0


def test_zlib_ratio_edges():
    from neurostore_text_extraction_ray.functions.textstats import zlib_ratio

    assert zlib_ratio("") == (0, 0, 0.0)
    assert zlib_ratio(None) == (0, 0, 0.0)
    n, c, r = zlib_ratio("a" * 10_000)
    assert n == 10_000 and c < 100 and r < 0.01   # repetitive compresses
    n2, c2, r2 = zlib_ratio("the quick brown fox jumps over the lazy dog")
    assert 0 < r2 <= 1.2
    # deterministic
    assert zlib_ratio("xyz " * 50) == zlib_ratio("xyz " * 50)
