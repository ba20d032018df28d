"""Property-based tests (hypothesis) for the driver-side algebras:
character classes, stats merge, and the summary merge. These layers
must be lawful for distributed merging to be order-insensitive —
per-partition summaries combine in whatever order tasks finish."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from structa_spark.chars import ANY_CHAR, CharClass, induce_pattern
from structa_spark.model import (
    BoolT, Empty, FloatT, IntT, StrT, ValueAny, merge,
)
from structa_spark.stats import LengthStats, Stats
from structa_spark.ui import params

chars = st.sets(st.sampled_from(string.printable[:70]), min_size=1,
                max_size=20).map(CharClass)
charsets = st.one_of(chars, st.just(ANY_CHAR))


@given(charsets, charsets)
def test_charclass_union_commutative(a, b):
    assert (a | b) == (b | a)


@given(charsets, charsets, charsets)
def test_charclass_union_associative(a, b, c):
    assert ((a | b) | c) == (a | (b | c))


@given(charsets)
def test_charclass_union_idempotent(a):
    assert (a | a) == a
    assert (a | ANY_CHAR) == ANY_CHAR


@given(charsets, charsets)
def test_charclass_intersection_subset(a, b):
    assert (a & b).issubset(a)
    assert (a & b).issubset(b)


@given(st.lists(st.sets(st.sampled_from("0123456789abcdef"),
                        min_size=1, max_size=16),
                min_size=1, max_size=12))
def test_induce_pattern_covers_all_chars(position_sets):
    pattern = induce_pattern(list(enumerate(position_sets)))
    assert len(pattern) == len(position_sets)
    for cc, seen in zip(pattern, position_sets):
        for ch in seen:
            assert ch in cc


ints = st.integers(min_value=-10**9, max_value=10**9)


def stat_of(lo, hi, card):
    lo, hi = min(lo, hi), max(lo, hi)
    return Stats(card=card, min=lo, max=hi, distinct=min(card, 10))


stats_s = st.builds(stat_of, ints, ints,
                    st.integers(min_value=1, max_value=10**6))


@given(stats_s, stats_s)
def test_stats_merge_commutative_bounds(a, b):
    m1, m2 = a + b, b + a
    assert m1.card == m2.card == a.card + b.card
    assert m1.min == m2.min == min(a.min, b.min)
    assert m1.max == m2.max == max(a.max, b.max)


@given(stats_s, stats_s, stats_s)
def test_stats_merge_associative_bounds(a, b, c):
    m1, m2 = (a + b) + c, a + (b + c)
    assert (m1.card, m1.min, m1.max) == (m2.card, m2.min, m2.max)


scalars = st.one_of(
    st.builds(lambda s: IntT(stats=s), stats_s),
    st.builds(lambda s: FloatT(stats=s), stats_s),
    st.builds(lambda s: BoolT(stats=s), stats_s),
    st.builds(lambda s: StrT(stats=s), stats_s),
    st.just(Empty()),
)


@given(scalars)
def test_merge_empty_identity(n):
    assert merge(Empty(), n) == n
    assert merge(n, Empty()) == n


@given(scalars, scalars)
@settings(max_examples=200)
def test_merge_commutative_type(a, b):
    m1, m2 = merge(a, b), merge(b, a)
    assert type(m1) is type(m2)


@given(stats_s, stats_s)
def test_numeric_tower_widening(sa, sb):
    # bool < int < float (reference types.py:780-834)
    assert isinstance(merge(IntT(stats=sa), FloatT(stats=sb)), FloatT)
    assert isinstance(merge(BoolT(stats=sa), IntT(stats=sb)), IntT)
    assert isinstance(merge(IntT(stats=sa), IntT(stats=sb)), IntT)


@given(stats_s, stats_s)
def test_incompatible_merge_is_value(sa, sb):
    assert isinstance(merge(StrT(stats=sa), IntT(stats=sb)), ValueAny)


@given(st.integers(min_value=0, max_value=10**6))
def test_size_parser_roundtrip_bytes(n):
    assert params.size(str(n)) == n


@given(st.floats(min_value=0, max_value=100, allow_nan=False,
                 allow_infinity=False))
def test_num_percent(p):
    assert abs(params.num(f"{p}%") - p / 100) < 1e-12


# -- multimodal header parsers: synth -> parse roundtrips -------------------

from structa_spark.operators.multimodal import (  # noqa: E402
    jpeg_bytes, mp4_bytes, parse_audio_header, parse_image_header,
    parse_video_header, png_bytes, wav_bytes,
)


@given(st.integers(1, 65535), st.integers(1, 65535))
def test_png_header_roundtrip(w, h):
    assert parse_image_header(png_bytes(w, h)) == ("png", w, h)


@given(st.integers(1, 65535), st.integers(1, 65535))
def test_jpeg_header_roundtrip(w, h):
    assert parse_image_header(jpeg_bytes(w, h)) == ("jpeg", w, h)


@given(st.integers(1, 384000), st.integers(1, 8),
       st.integers(0, 2000), st.sampled_from([8, 16, 32]),
       st.booleans())
def test_wav_header_roundtrip_property(rate, ch, n, bits, junk):
    parsed = parse_audio_header(
        wav_bytes(rate, ch, n, bits=bits, junk_chunk=junk))
    assert parsed == ("pcm_wav", rate, ch, n)


@given(st.integers(1, 8191), st.integers(1, 8191),
       st.integers(1, 10**9), st.integers(1, 10**6),
       st.integers(1, 3), st.booleans(), st.booleans())
@settings(max_examples=40, deadline=None)
def test_mp4_header_roundtrip_property(w, h, dur, ts, nt, v1, free):
    got = parse_video_header(
        mp4_bytes(w, h, dur, ts, n_tracks=nt,
                  mvhd_v1=v1, free_box=free))
    assert got == ("mp4_isom", dur / ts, w, h, nt)


@given(st.binary(max_size=64))
def test_header_parsers_never_raise_on_garbage(payload):
    parse_image_header(payload)      # any result, no exception
    parse_audio_header(payload)
    parse_video_header(payload)


# -- multimodal codecs: encode/decode must be exact inverses ---------------

import numpy as np

from structa_spark.operators.multimodal import (
    _lzw_decode, _lzw_encode, decode_gif_pixels, decode_png_pixels,
    decode_wav_samples, encode_gif, encode_png, wav_bytes,
)


@given(st.lists(st.integers(0, 255), min_size=1, max_size=2000))
@settings(max_examples=60, deadline=None)
def test_lzw_roundtrip_property(seq):
    # symbols must fit the alphabet implied by min_code_size
    mcs = max(2, max(seq).bit_length()) if max(seq) else 2
    assert _lzw_decode(_lzw_encode(seq, mcs), mcs) == seq


@given(st.integers(1, 12), st.integers(1, 12), st.integers(1, 4),
       st.lists(st.integers(0, 4), min_size=1, max_size=6),
       st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, channels, filters, seed):
    rng = np.random.RandomState(seed % (2**31))
    arr = rng.randint(0, 256, size=(h, w, channels)).astype(np.uint8)
    b = encode_png(arr, row_filters=filters)
    assert np.array_equal(decode_png_pixels(b), arr)


@given(st.integers(1, 10), st.integers(1, 10), st.integers(1, 8),
       st.booleans(), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(h, w, npal, interlace, seed):
    rng = np.random.RandomState(seed % (2**31))
    idx = rng.randint(0, npal, size=(h, w)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(npal, 3)).astype(np.uint8)
    b = encode_gif(idx, pal, interlace=interlace)
    assert np.array_equal(decode_gif_pixels(b), pal[idx])


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=500),
       st.integers(1, 2))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(samples, channels):
    n = len(samples) - len(samples) % channels
    if n == 0:
        return
    s = np.array(samples[:n], "<i2")
    b = wav_bytes(8000, channels, n // channels, bits=16,
                  samples=s.tobytes())
    got, rate = decode_wav_samples(b)
    assert rate == 8000
    assert np.array_equal(got.ravel(), s)


@given(st.text(alphabet="abcdef", min_size=1, max_size=20),
       st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_wordpiece_encode_roundtrip_property(word, seed):
    # with every single character in the vocabulary, greedy
    # longest-match never UNKs and the pieces rejoin to the word
    import random

    from structa_spark.operators.text import (
        WORDPIECE_CONT, _wordpiece_encode_word)

    rng = random.Random(seed)
    pieces = {word[0]}
    pieces.update(WORDPIECE_CONT + c for c in set(word[1:]))
    pieces.update(c for c in set(word))      # word-initial singles
    # add random contiguous merges (both word-initial and ##-forms)
    for _ in range(rng.randint(0, 8)):
        i = rng.randrange(len(word))
        j = rng.randint(i + 1, min(len(word), i + 6))
        frag = word[i:j]
        pieces.add(frag if i == 0 else WORDPIECE_CONT + frag)
    max_len = max(len(p) - (len(WORDPIECE_CONT)
                            if p.startswith(WORDPIECE_CONT) else 0)
                  for p in pieces)
    got = _wordpiece_encode_word(word, pieces, max_len, "[UNK]")
    assert got != ["[UNK]"]
    rebuilt = got[0] + "".join(p[len(WORDPIECE_CONT):]
                               for p in got[1:])
    assert rebuilt == word
    # greedy: the first piece is the LONGEST vocab prefix
    best = max((w for w in (word[:k] for k in range(1, len(word) + 1))
                if w in pieces), key=len)
    assert got[0] == best


@given(st.lists(st.tuples(st.integers(1, 5), st.integers(1, 1000)),
                min_size=1, max_size=4),
       st.integers(1, 4), st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_sample_table_roundtrip_property(runs, spc, seed):
    # build -> parse is the identity on timestamps, sizes and the
    # contiguous chunk layout for any stts run list / chunking
    import random

    from structa_spark.operators.multimodal import (
        mp4_frame_index_bytes, parse_sample_table)

    n = sum(c for c, _ in runs)
    rng = random.Random(seed)
    sizes = [rng.randint(1, 5000) for _ in range(n)]
    b = mp4_frame_index_bytes(64, 64, 1000, runs,
                              sample_sizes=sizes,
                              samples_per_chunk=spc,
                              base_offset=4096)
    ts, frames = parse_sample_table(b)
    assert ts == 1000 and len(frames) == n
    exp_ts, t = [], 0
    for c, d in runs:
        for _ in range(c):
            exp_ts.append(t)
            t += d
    assert [f[0] for f in frames] == exp_ts
    assert [f[2] for f in frames] == sizes
    off = 4096
    for f, sz in zip(frames, sizes):
        assert f[1] == off
        off += sz


# -- PDF text round trip ------------------------------------------------------

pdf_texts = st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs",)),
    min_size=0, max_size=200)


@settings(max_examples=60, deadline=None)
@given(pdf_texts, st.sampled_from(
    ["plain", "raw", "tj", "hex", "indirect", "trunc"]))
def test_pdf_text_roundtrip_property(text, variant):
    # ANY unicode text (escapes, newlines, parens, controls) must
    # survive pdf_bytes -> extract_pdf_text byte-exactly through
    # every writer variant — the fuzz twin of the fixed-case tests
    from structa_spark.sources.pdf import extract_pdf_text, pdf_bytes

    kw = {"plain": {}, "raw": {"compress": False},
          "tj": {"tj_arrays": True}, "hex": {"hex_strings": True},
          "indirect": {"indirect_length": True},
          "trunc": {"truncate_tail": True}}[variant]
    got, ns, err = extract_pdf_text(pdf_bytes(text, **kw))
    # the one lossy edge: a text of ONLY empty lines shows nothing
    # visible distinguishable from the empty document
    assert got == text or (got is None and text.strip("\n") == "")
