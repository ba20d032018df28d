"""Differential tests: seeded-random nasty-whitespace pages run
through the line-rule / tokenization operators AND a line-by-line
plain-Python reference implementation. The oracle queries pin parity
on the (single-spaced, ASCII) fixtures; these pin the rule semantics
on inputs the fixtures never produce — tabs, newlines at boundaries,
NBSP inside tokens, bullets, ellipses, curly quotes, accents.

The references deliberately mirror JAVA/RE2 regex semantics:
``\\s`` is the ASCII class (NBSP is NOT whitespace — it glues
tokens), ``trim`` strips spaces only, splits keep boundary empties
(which ``tokens`` then drops). Rounded fractions compare against the
UNROUNDED reference with half-step tolerance so a value sitting on a
rounding boundary cannot flake the test.
"""

import random
import re

from pyspark.sql import functions as F

WS = r"[ \t\n\x0b\f\r]"
NWS = r"[^ \t\n\x0b\f\r]"

WORDS = ["the", "quick", "café", "naïve", "data", "spark", "»x«",
         "be", "of", "and", "javascript", "row#", "...", "–", "a",
         "longish", "word", "“q”", "N B", "t\tb"]
PUNCT = ["", ".", "!", "?", '"', "...", "…"]
SEPS = ["\n", "\n", "\n\n", " \n", "\n ", "\t\n"]


def _pages(n=150, seed=7):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        if i % 29 == 0:
            out.append((i, None))
            continue
        lines = []
        for _ in range(rng.randrange(0, 9)):
            toks = [rng.choice(WORDS)
                    for _ in range(rng.randrange(0, 7))]
            ln = " ".join(toks) + rng.choice(PUNCT)
            if rng.random() < 0.15:
                ln = "- " + ln
            if rng.random() < 0.1:
                ln = " " + ln + " "
            lines.append(ln)
        page = rng.choice(SEPS).join(lines)
        if rng.random() < 0.2:
            page = "\t" + page + "\n"
        out.append((i, page))
    return out


def _toks(t):
    """tokens(): trim spaces, ASCII-\\s+ split, drop empties."""
    s = (t or "").strip(" ")
    if s == "":
        return []
    return [w for w in re.split(WS + "+", s) if w != ""]


def test_c4_clean_lines_differential(spark):
    from structa_spark.operators import text as T

    rows = _pages()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.c4_clean_lines(df).collect()}
    for i, page in rows:
        t = page or ""
        lines = t.split("\n")
        kept = [ln for ln in lines
                if re.search(r'[.!?"]' + WS + r"*$", ln)
                and len(re.findall(NWS + "+", ln)) >= 5
                and "javascript" not in ln.lower()]
        clean = "\n".join(kept)
        ns = len(re.findall(r"[.!?]", clean))
        r = got[i]
        assert r.n_lines == len(lines), (i, page)
        assert r.n_kept_lines == len(kept), (i, page)
        assert r.text_clean == clean, (i, page)
        assert r.n_sentences == ns, (i, page)
        assert r.page_keep == (ns >= 3), (i, page)


def test_gopher_dup_fractions_differential(spark):
    from structa_spark.operators import text as T

    rows = _pages(seed=11)
    # force real duplicates into some pages
    rows = [(i, (p + "\ndup line here.\ndup line here." if p and
                 i % 3 == 0 else p)) for i, p in rows]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.gopher_dup_fractions(df).collect()}

    def fracs(t, sep):
        units = [u.strip(" ") for u in re.split(sep, t or "")]
        units = [u for u in units if u != ""]
        if not units:
            return 0.0, 0.0
        dist = list(dict.fromkeys(units))
        uf = (len(units) - len(dist)) / len(units)
        tot = sum(len(u) for u in units)
        dtot = sum(len(u) for u in dist)
        cf = (tot - dtot) / tot if tot else 0.0
        return uf, cf

    for i, page in rows:
        lf, lcf = fracs(page, r"\n")
        pf, pcf = fracs(page, r"\n{2,}")
        r = got[i]
        for spark_v, ref_v in [(r.dup_line_frac, lf),
                               (r.dup_line_char_frac, lcf),
                               (r.dup_para_frac, pf),
                               (r.dup_para_char_frac, pcf)]:
            assert abs(spark_v - ref_v) <= 5.1e-5, (i, page)


def test_gopher_quality_flags_differential(spark):
    from structa_spark.operators import text as T

    rows = _pages(seed=23)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.gopher_quality_flags(df).collect()}
    for i, page in rows:
        t = page or ""
        toks = _toks(t)
        n = len(toks)
        r = got[i]
        assert r.n_words == n, (i, page)
        if n:
            mean = sum(len(w) for w in toks) / n
            sym = (t.count("#") + len(re.findall(r"\.\.\.", t))
                   + t.count("…")) / n
            alpha = sum(1 for w in toks
                        if re.search("[A-Za-z]", w)) / n
            assert abs(r.mean_word_len - mean) <= 5.1e-5, (i, page)
            assert abs(r.symbol_ratio - sym) <= 5.1e-5, (i, page)
            assert abs(r.alpha_word_frac - alpha) <= 5.1e-5, (i, page)
        else:
            assert (r.mean_word_len, r.symbol_ratio,
                    r.alpha_word_frac) == (0.0, 0.0, 0.0)
        stops = len({w.lower() for w in toks}
                    & set(T.GOPHER_STOPWORDS))
        assert r.stopword_hits == stops, (i, page)
        lines = t.split("\n")
        bullet = sum(1 for ln in lines
                     if re.search("^" + WS + r"*[-*•‣▪]", ln))
        ell = sum(1 for ln in lines
                  if re.search(r"(\.\.\.|…)" + WS + r"*$", ln))
        assert abs(r.bullet_line_frac - bullet / len(lines)) \
            <= 5.1e-5, (i, page)
        assert abs(r.ellipsis_line_frac - ell / len(lines)) \
            <= 5.1e-5, (i, page)


def test_tokens_differential(spark):
    # the shared tokenizer itself, on boundary-whitespace shapes the
    # fixtures never produce: Spark tokens() must equal the ASCII
    # strip/split/drop-empties reference (NBSP glues, tabs split)
    from structa_spark.operators.text import tokens

    rows = _pages(seed=31)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.tk for r in
           df.select("doc_id",
                     tokens(F.col("text")).alias("tk")).collect()}
    for i, page in rows:
        want = _toks(page) if page is not None else None
        assert got[i] == want, (i, page)


def test_span_dup_coverage_differential(spark):
    # the span-dedup signal on boundary-whitespace corpora: per-doc
    # span counts and cross-doc duplicate-span counts must equal the
    # Python reference (lowered ASCII tokenization, 5-gram spans,
    # >= 2 distinct docs per duplicated span)
    from collections import Counter

    from structa_spark.operators import dedup as D

    rows = _pages(n=80, seed=57)
    # force cross-doc duplicated spans into a third of the docs
    boiler = "all rights reserved by the original content owner"
    rows = [(i, (p + "\n" + boiler if p and i % 3 == 0 else p))
            for i, p in rows]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_frac)
           for r in D.duplicate_span_coverage(df, n=5).collect()}

    def spans(t):
        toks = _toks((t or "").lower())
        return [" ".join(toks[j:j + 5])
                for j in range(len(toks) - 4)]

    per_doc = {i: spans(p) for i, p in rows}
    doc_count = Counter()
    for i, ss in per_doc.items():
        for s in set(ss):
            doc_count[s] += 1
    for i, p in rows:
        ss = per_doc[i]
        dup = sum(1 for s in ss if doc_count[s] >= 2)
        frac = round(dup / len(ss), 4) if ss else 0.0
        assert got[i][0] == len(ss), (i, p)
        assert got[i][1] == dup, (i, p)
        assert abs(got[i][2] - frac) <= 5.1e-5, (i, p)


def test_normalize_typography_differential(spark):
    from structa_spark.operators import text as T

    rows = _pages(seed=43)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_norm, r.norm_changed)
           for r in T.normalize_typography(df).collect()}
    table = str.maketrans(dict(zip(T.TYPOGRAPHY_SRC,
                                   T.TYPOGRAPHY_DST)))
    acc = str.maketrans(dict(zip(T.ACCENT_SRC, T.ACCENT_DST)))
    for i, page in rows:
        if page is None:
            assert got[i] == (None, False)
            continue
        want = page.translate(table).replace("…", "...") \
                   .translate(acc)
        assert got[i] == (want, want != page), (i, page)

def test_token_entropy_differential(spark):
    import math

    from structa_spark.operators import text as T

    rows = _pages(seed=11)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.token_entropy(df).collect()}
    for i, page in rows:
        toks = _toks((page or "").lower())
        if not toks:
            assert i not in got, (i, page)
            continue
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        n = len(toks)
        h = math.log(n) - sum(c * math.log(c) for c in tf.values()) / n
        r = got[i]
        assert r.n_tokens == n, (i, page)
        assert r.n_types == len(tf), (i, page)
        assert abs(r.entropy - h) <= 0.5e-4 + 1e-9, (i, page)
        want_norm = h / math.log(len(tf)) if len(tf) > 1 else 0.0
        assert abs(r.entropy_norm - want_norm) <= 0.5e-4 + 1e-9, \
            (i, page)


def test_bloom_flag_docs_differential(spark):
    from structa_spark.functions.hashing import (
        MERSENNE_P, MINHASH_PARAMS, md5_long_py)
    from structa_spark.operators import dedup as D

    rows = [(i, p) for i, p in _pages(seed=13) if i < 80]
    ev = [(i, p) for i, p in rows if i < 20 and p is not None]
    co = [(i, p) for i, p in rows if i >= 20]
    m, nh = 1 << 12, 4

    def shingles(t):
        toks = _toks(re.sub(WS + "+", " ",
                            (t or "").lower()).strip(" "))
        if len(toks) >= 3:
            out = [" ".join(toks[j:j + 3])
                   for j in range(len(toks) - 2)]
        elif t is None:
            out = []          # null text carries zero shingles
        else:
            out = [" ".join(toks)]
        seen, uniq = set(), []
        for s in out:
            if s not in seen:
                seen.add(s)
                uniq.append(s)
        return uniq

    def positions(s):
        x = md5_long_py(s)
        return [((a * (x % MERSENNE_P) + b) % MERSENNE_P) % m
                for a, b in MINHASH_PARAMS[:nh]]

    bits = set()
    for _, p in ev:
        for s in shingles(p):
            if s is not None:
                bits.update(positions(s))

    edf = spark.createDataFrame(ev, "doc_id long, text string")
    cdf = spark.createDataFrame(co, "doc_id long, text string")
    words = D.build_bloom(
        edf.select(F.explode(D.word_shingles(F.col("text")))
                   .alias("key")), m_bits=m, n_hashes=nh)
    got = {r.doc_id: r for r in D.bloom_flag_docs(
        cdf, words, n_hashes=nh, m_bits=m).collect()}
    for i, page in co:
        sh = shingles(page)
        hits = sum(1 for s in sh if s is not None
                   and all(pp in bits for pp in positions(s)))
        r = got[i]
        assert r.n_shingles == len(sh), (i, page)
        assert r.n_hits == hits, (i, page)
        assert r.contaminated == (hits > 0), (i, page)


def test_script_mix_stats_differential(spark):
    # nasty mixed-script pages with mojibake fragments, control
    # bytes, Cyrillic/CJK runs vs a plain-Python reference of the
    # same length-difference semantics
    import random as _random

    from structa_spark.operators.text import script_mix_stats

    frags = ["cafÃ©", "â€œq", "�bad", "\x07", "привет",
             "你好", "plain", "123", "mix3d", "", " ", "ÃÃ",
             "â€â€", "a\x1fb", "ӿѐ", "鿿一"]
    rng = _random.Random(41)
    rows = []
    for i in range(120):
        if i % 31 == 0:
            rows.append((i, None))
            continue
        rows.append((i, "".join(rng.choice(frags)
                                for _ in range(rng.randrange(0, 8)))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in script_mix_stats(df).collect()}

    def ref(t):
        t = t or ""
        n = len(t)
        latin = sum("a" <= c.lower() <= "z" and c.isascii()
                    for c in t)
        digit = sum("0" <= c <= "9" for c in t)
        cyr = sum("Ѐ" <= c <= "ӿ" for c in t)
        cjk = sum("一" <= c <= "鿿" for c in t)
        moji = (sum(c in "Ã�" for c in t)
                + t.count("â€"))
        ctrl = sum(c in ("\x0b\x0c"
                         + "".join(chr(x) for x in range(9))
                         + "".join(chr(x) for x in range(14, 32)))
                   for c in t)
        return n, latin, digit, cyr, cjk, moji, ctrl

    for i, t in rows:
        n, latin, digit, cyr, cjk, moji, ctrl = ref(t)
        g = got[i]
        assert g.n_chars == n, (i, t)
        assert g.mojibake_hits == moji, (i, t)
        assert g.control_count == ctrl, (i, t)
        assert g.encoding_ok == (moji == 0 and ctrl == 0), (i, t)
        for frac, cnt in ((g.latin_frac, latin),
                          (g.digit_frac, digit),
                          (g.cyrillic_frac, cyr),
                          (g.cjk_frac, cjk)):
            want = cnt / n if n else 0.0
            assert abs(frac - want) <= 0.00005 + 1e-12, (i, t, frac,
                                                         want)
