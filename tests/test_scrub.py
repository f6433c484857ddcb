"""Training-data scrubbing operators (stages/scrub.py) against
independent scalar oracles (Python re / unicodedata — NOT the polars
kernels the stages use), plus cross-engine fixtures that pin the
RE2/Rust-regex common-subset assumption."""

import re
import unicodedata

import numpy as np
import pyarrow as pa

from search_engine_core_ray.stages import scrub as sc

PII_FIXTURES = [
    "contact user35@example.com or +1 555 035 end",
    "a.b+c%d@x-y.co.uk mid 123-456-7890 and +44 20 7946 0958.",
    "no pii here",
    "x@y.z 12 34",           # TLD too short, digit run too short: untouched
    "tel: 5551234567890",
    "two a@b.io c@d.org and 555 123 4567 777-888-9999",
    "",
]


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def scalar_pii(text):
    """Independent oracle: python re, same documented semantics
    (e-mails first, phones over the e-mail-redacted text)."""
    n_em = len(re.findall(sc.EMAIL_RE, text))
    red = re.sub(sc.EMAIL_RE, sc.EMAIL_TAG, text)
    n_ph = len(re.findall(sc.PHONE_RE, red))
    red = re.sub(sc.PHONE_RE, sc.PHONE_TAG, red)
    return red, n_em, n_ph


def test_pii_redact_matches_scalar_oracle(ray_session):
    out = (
        sc.pii_redact(_docs_ds(PII_FIXTURES))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(PII_FIXTURES):
        red, n_em, n_ph = scalar_pii(t)
        assert out.text[i] == red, t
        assert out.n_emails[i] == n_em
        assert out.n_phones[i] == n_ph
    # the fixtures exercise both tags and both zero-cases
    assert out.n_emails.sum() >= 4 and out.n_phones.sum() >= 5
    assert (out.n_emails == 0).any() and (out.n_phones == 0).any()


def test_pii_redact_is_identity_without_pii(ray_session):
    texts = ["plain words only", "numbers 12 34 alone", "a@b only"]
    out = sc.pii_redact(_docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert list(out.text) == texts
    assert out.n_emails.sum() == 0 and out.n_phones.sum() == 0


DECON_DOCS = [
    "clean document with nothing bad",
    "has the batch batch phrase",
    "HAS THE BATCH BATCH PHRASE UPPER",   # case-insensitive hit
    "slow  query is not a hit (double space breaks the n-gram)",
    "ends with slow query",
    "join orders is a hit via substring join order",
]
DECON_PHRASES = ["batch batch", "slow query", "join order"]


def test_decontaminate_drops_exactly_the_hits(ray_session):
    out = sc.decontaminate(_docs_ds(DECON_DOCS), DECON_PHRASES).to_pandas()
    kept = sorted(out.doc_id)
    expected = [
        i
        for i, t in enumerate(DECON_DOCS)
        if not any(p in t.lower() for p in DECON_PHRASES)
    ]
    assert kept == expected == [0, 3]


def test_stratified_sample_matches_hash_oracle(ray_session):
    import ray.data

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    src = np.array([f"src{i % 10}" for i in range(n)], dtype=object)
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids), "source": pa.array(src, pa.string())}
        )
    )
    rates = {f"src{i}": (10 - i) / 10 for i in range(10)}
    out = sc.stratified_sample(ds, rates).to_pandas()
    # independent oracle: pure-python big-int arithmetic
    expect = {
        int(i)
        for i in ids
        if (int(i) * 2654435761) % (2**32) % 10000 < round(rates[src[i]] * 10000)
    }
    assert set(out.doc_id) == expect
    # rate monotonicity actually shows up at this n
    counts = out.groupby("source").size()
    assert counts["src0"] == 200          # rate 1.0 keeps everything
    assert "src9" not in counts or counts["src9"] < counts["src0"]


def test_stratified_sample_unknown_source_drops(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["known", "mystery", "known"]),
            }
        )
    )
    out = sc.stratified_sample(ds, {"known": 1.0}).to_pandas()
    assert set(out.source) == {"known"}


NORM_FIXTURES = [
    # explicit escapes: inputs decomposed (base + combining mark),
    # expected composed
    ("cafe\u0301 du  monde", "caf\u00e9 du monde"),
    ("  lead \t and\r\ntrail  ", "lead and trail"),
    ("already clean", "already clean"),
    ("tabs\tand\nnewlines\fand\vmore", "tabs and newlines and more"),
    ("", ""),
    ("A\u030a ring", "\u00c5 ring"),
]


def test_normalize_text_matches_unicodedata_oracle(ray_session):
    texts = [t for t, _ in NORM_FIXTURES]
    out = (
        sc.normalize_text(_docs_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, (raw, expected) in enumerate(NORM_FIXTURES):
        # independent oracle: stdlib unicodedata + re
        oracle = re.sub(r"[ \t\r\n\f\v]+", " ", unicodedata.normalize("NFC", raw)).strip(" ")
        assert out.text[i] == expected == oracle, raw


def test_sample_bucket_is_stable_across_dtypes():
    ids = np.array([0, 1, 12345, 2**31, 2**40 + 17], dtype=np.int64)
    b = sc.sample_bucket(ids)
    for i, v in zip(ids.tolist(), b.tolist()):
        assert v == (i * 2654435761) % (2**32) % 10000


# property: the polars (Rust-regex) pipeline agrees with the stdlib
# re oracle on arbitrary ASCII text — pins the RE2/Rust/re common-
# subset assumption the SQL oracles rely on
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ascii_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=200,
    )

    @given(st.lists(_ascii_text, min_size=1, max_size=8))
    @settings(max_examples=30, deadline=None)
    def test_pii_redact_property_matches_re(texts):
        import polars as pl

        df = pl.DataFrame({"t": pl.Series(texts, dtype=pl.Utf8)})
        out = sc._pii_batch(df.to_arrow().rename_columns(["text"]), "text")
        got = out.column("text").to_pylist()
        for raw, red in zip(texts, got):
            assert red == scalar_pii(raw)[0]
except ImportError:  # pragma: no cover
    pass


def test_contamination_frac_matches_scalar_oracle(ray_session):
    import re
    import numpy as np
    import pyarrow as pa
    import ray.data

    from search_engine_core_ray.stages.scrub import contamination_frac

    bench = ["alpha beta gamma delta", "one two three"]
    texts = [
        "alpha beta gamma delta epsilon",   # two contaminated windows
        "zero one two three four",          # two contaminated windows
        "completely clean words here now",  # none
        "al",                               # < 3 tokens -> zero windows
        "",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)

    n = 3
    def wins(t):
        tk = re.findall(r"[a-z0-9]{2,}", t.lower())
        return [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)]

    bw = {w for b in bench for w in wins(b)}
    out = (
        contamination_frac(ds, bench, n=n)
        .to_pandas().set_index("doc_id").sort_index()
    )
    for did, t in enumerate(texts):
        ws = wins(t)
        contam = sum(1 for w in ws if w in bw)
        assert out.loc[did, "n_win"] == len(ws)
        assert out.loc[did, "contam_win"] == contam
        assert out.loc[did, "contam_frac"] == (contam / len(ws) if ws else 0.0)
    assert out["contam_win"].sum() > 0 and (out["contam_win"] == 0).any()
