"""Property test: the column-expression Soundex must equal an
independent pure-Python implementation of the same simplified algorithm
(no H/W elision) on arbitrary word-like inputs — one batched Spark
round-trip over the whole generated corpus, not per-example sessions."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flight_radar_pipeline_spark.functions.text import soundex_code

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CODE = "01230120022455012623010202"
_MAP = dict(zip(_ALPHA, _CODE))


def _py_soundex(word: str) -> str | None:
    s = "".join(ch for ch in word.upper() if ch in _ALPHA)
    if not s:
        return None
    coded = "".join(_MAP[ch] for ch in s)
    # collapse runs of the same digit
    out = []
    for ch in coded:
        if not out or out[-1] != ch:
            out.append(ch)
    collapsed = "".join(out)
    rest = collapsed[1:].replace("0", "")
    return s[0] + (rest[:3]).ljust(3, "0")


_words = st.text(
    alphabet=string.ascii_letters + string.digits + " -'.",
    min_size=0,
    max_size=24,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_words, min_size=1, max_size=40))
def test_soundex_matches_python_reference(spark, words):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, word string"
    ).select("i", soundex_code("word").alias("code"))
    got = {r.i: r.code for r in df.collect()}
    for i, w in enumerate(words):
        assert got[i] == _py_soundex(w), (w, got[i], _py_soundex(w))
