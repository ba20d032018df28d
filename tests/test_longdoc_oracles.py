"""Long-document oracle parity: the span/LM/DSIR/winnow registry
queries, hash-matched against their DuckDB oracles on MULTI-THOUSAND-
token documents.

The driver fixture's documents max out near 100 tokens, so every
oracle pass to date exercised only short texts — the blind spot that
let a quadratic-in-doc-length gram builder survive five rounds with
green correctness. This suite regenerates a documents table at
realistic lengths (1.5k-4k tokens, shared cross-document boilerplate
blocks, labeled lang/source) and replays the SAME registry callables
and the SAME oracle SQL against it. Oracles that pin a constant
position bound sized to the short fixture (documented in their
docstrings) get that single constant bumped here — the substitution
asserts it matched, so a renamed bound fails loudly instead of
silently testing nothing.
"""

import hashlib

import pandas as pd
import pytest

from tests.test_queries import _canon

N_DOCS = 24
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
          "omicron", "pi", "rho", "sigma", "tau", "upsilon"]
_LANGS = ["en", "de", "fr", "es"]
# a 60-token boilerplate block shared by every third document — the
# cross-document duplicated spans the span/winnow operators exist for
_BOILER = " ".join(_WORDS[(7 * i) % len(_WORDS)] for i in range(60))


def _doc_text(d: int) -> str:
    n_tokens = 1500 + (d * 997) % 2500          # 1.5k - 4k tokens
    toks = [_WORDS[(d * 7 + i * 3) % len(_WORDS)] + str((d + i) % 89)
            for i in range(n_tokens)]
    text = " ".join(toks)
    if d % 3 == 0:
        mid = len(toks) // 2
        text = " ".join(toks[:mid]) + " " + _BOILER + " " + \
            " ".join(toks[mid:])
    return text


@pytest.fixture(scope="module")
def longdoc_dir(tmp_path_factory):
    rows = []
    for d in range(N_DOCS):
        text = _doc_text(d)
        rows.append({"doc_id": d, "text": text,
                     "lang": _LANGS[d % len(_LANGS)],
                     "source": f"src{d % 4}",
                     "n_chars": len(text)})
    pdf = pd.DataFrame(rows)
    out = tmp_path_factory.mktemp("longdocs")
    pdf.to_parquet(out / "documents.parquet", index=False)
    return str(out)


@pytest.fixture(scope="module")
def duck_long(longdoc_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{longdoc_dir}/documents.parquet'")
    return con


# oracle constant bounds sized to the short driver fixture -> their
# long-doc replacements (each must match exactly once or the test
# errors rather than silently comparing a truncated oracle)
_BOUND_BUMPS = {
    "span_dedup_texts": [("range(1, 129)", "range(1, 8193)")],
    "window_chunks": [("range(0, 128, 12)", "range(0, 8192, 12)")],
    "winnow_overlap_pairs": [("generate_series(1, 1024)",
                              "generate_series(1, 65536)")],
}

_LONGDOC_QUERIES = [
    "span_dup_coverage",
    "span_dedup_texts",
    "window_chunks",
    "winnow_overlap_pairs",
    "bigram_nll",
    "dsir_logweights",
    "source_token_jsd",
    "nb_lang_confusion",
    "scrub_eval_spans",
    "repetition_ngram_profile",
]


@pytest.mark.parametrize("name", _LONGDOC_QUERIES)
def test_longdoc_query_matches_oracle(spark, duck_long, longdoc_dir,
                                      name):
    from structa_spark.queries import REGISTRY

    fn, sql = REGISTRY[name]
    assert sql is not None
    for old, new in _BOUND_BUMPS.get(name, []):
        assert sql.count(old) >= 1, \
            f"{name}: oracle bound {old!r} not found — bump map stale"
        sql = sql.replace(old, new)
    sdf = fn(spark, longdoc_dir).toPandas()
    ddf = duck_long.execute(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    assert len(sdf) == len(ddf), \
        f"{name}: row count {len(sdf)} vs {len(ddf)}"
    assert len(sdf) > 0, f"{name}: empty result proves nothing"
    assert _canon(sdf) == _canon(ddf), \
        f"{name}: value hash mismatch on long docs\nspark:\n" \
        f"{sdf.head(5)}\noracle:\n{ddf.head(5)}"
