"""Porter2 (Snowball English) stemmer: algorithm test vectors and
engine integration.

Vectors are hand-derived from the published algorithm description
(snowballstem.org, "The English (Porter2) stemming algorithm") and
match nltk's ``SnowballStemmer("english")`` outputs for these words.
Suffix resolution follows nltk's longest-word-suffix-then-region-check
convention (the reference's actual runtime, textnormalizer.pyx:112-136);
boundary-divergent words between that and Snowball's limit-aware
``among()`` are deliberately excluded.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wikitfidf_spark.operators.porter2 import porter2_en
from wikitfidf_spark.operators.stemdict import STEMMERS

VECTORS = {
    # exceptional forms + invariants
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "atlas": "atlas", "cosmos": "cosmos",
    "bias": "bias", "andes": "andes",
    # invariant after step 1a
    "inning": "inning", "innings": "inning", "outing": "outing",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    "proceeding": "proceed",
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "tie",
    "dies": "die", "flies": "fli", "mules": "mule", "cats": "cat",
    "caress": "caress", "gas": "gas", "this": "this", "denied": "deni",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "hoping": "hope", "meetings": "meet",
    "string": "string", "owned": "own", "humbled": "humbl",
    # step 1c
    "happy": "happi", "crying": "cri", "say": "say", "by": "by",
    "enjoy": "enjoy", "cry": "cri", "dry": "dri",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valency": "valenc", "hesitancy": "hesit", "digitizer": "digit",
    "radically": "radic", "differently": "differ", "vilely": "vile",
    "analogously": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "probably": "probabl",
    "consistency": "consist", "agency": "agenc", "geology": "geolog",
    # step 3
    "electricity": "electr", "electrical": "electr",
    "generically": "generic", "hopeful": "hope", "goodness": "good",
    "duplicate": "duplic",
    # step 4
    "national": "nation", "accumulation": "accumul",
    "government": "govern", "consignment": "consign",
    "generate": "generat", "generously": "generous",
    # step 5
    "controll": "control", "roll": "roll",
    # short words pass through
    "a": "a", "at": "at", "be": "be",
}


@pytest.mark.parametrize("word,stem", sorted(VECTORS.items()))
def test_porter2_vectors(word, stem):
    assert porter2_en(word) == stem


def test_registered():
    assert STEMMERS["porter2_en"] is porter2_en


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", min_size=0, max_size=20))
@settings(max_examples=500, deadline=None)
def test_porter2_total_function(word):
    """Never raises, output is deterministic, lowercase, and never
    longer than input + 1 (the only growth is step 1b's added 'e')."""
    out = porter2_en(word)
    assert out == porter2_en(word)
    assert out == out.lower()
    assert len(out) <= len(word) + 1


def test_porter2_through_column_stemmer(spark):
    """The Arrow-lifted column path computes the same stems as the
    plain function."""
    import pandas as pd

    from wikitfidf_spark.operators.stemdict import column_stemmer

    words = sorted(VECTORS)
    df = spark.createDataFrame(pd.DataFrame({"term": words}))
    col = column_stemmer(porter2_en)
    got = {r["term"]: r["stem"] for r in df.withColumn("stem", col(df["term"])).collect()}
    assert got == {w: VECTORS[w] for w in words}


def test_porter2_index_e2e(spark, tmp_path):
    """An index built with stemmer='porter2_en' serves queries against
    the stemmed vocabulary and destems back to original words."""
    from pyspark.sql import functions as F

    from wikitfidf_spark.index.build import IndexConfig, build_index
    from wikitfidf_spark.index.query import InvertedIndex, Query

    rows = [
        ("r", f"f{i}.txt", "c", "en",
         "the ponies hopping happily are generously troubled " * (i + 1))
        for i in range(6)
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    d = str(tmp_path / "idx_p2")
    build_index(
        spark, docs, d,
        IndexConfig(
            n_shards=2, n_salts=2, block_size=16,
            stemmer="porter2_en", tokenizer="arrow",
        ),
        resume=False,
    )
    idx = InvertedIndex(spark, d)
    # queries hit the stemmed forms
    res = idx.topk_batch([Query(0, ["poni", "hop"], "AND", 10)]).collect()
    assert len(res) == 6
    # raw forms are not in the index vocabulary
    assert idx.topk_batch([Query(0, ["ponies"], "OR", 10)]).count() == 0
    # the dictionary holds the stemmed vocabulary
    import os

    from wikitfidf_spark.index.build import index_paths, load_manifest

    m = load_manifest(d)
    vocab = {
        r["term"]
        for r in spark.read.parquet(
            os.path.join(d, index_paths(m)["dictionary"])
        ).collect()
    }
    assert {"poni", "hop", "generous", "troubl", "happili"} <= vocab
    assert not {"ponies", "hopping", "generously", "troubled"} & vocab
