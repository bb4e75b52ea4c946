"""Property tests for the text/dedup kernels added in round 3.

Pure-Python/numpy properties (no Spark session needed): hypothesis drives
the url grammar and token shapes far past what the fixture corpus covers.
"""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geocode_spark.operators.dedup import _token_hashes


def _canon_py(url: str) -> str:
    """Reference transcription of canonicalize_urls' per-row semantics
    (same regexes, Python re — Java/RE2/re agree on these explicit-class
    patterns by construction)."""
    base = re.match(r"^([^#]*)", url).group(1)
    pre = re.match(r"^([^?]*)", base).group(1)
    mq = re.match(r"^[^?]*[?](.*)$", base)
    q = mq.group(1) if mq else ""
    msh = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", pre)
    sh_raw = msh.group(1) if msh else ""
    sh = sh_raw.lower()
    sh = re.sub(r"^(http://[^/:]*):80$", r"\1", sh)
    sh = re.sub(r"^(https://[^/:]*):443$", r"\1", sh)
    path = re.sub(r"/+$", "", pre[len(sh_raw):])
    keep = [p for p in q.split("&")
            if p != "" and not re.search(
                r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)=", p)]
    qk = "&".join(keep)
    return sh + path + (f"?{qk}" if qk else "")


_URL_CHARS = st.text(
    alphabet="abcXYZ019-._~/", min_size=0, max_size=12)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "ftp", ""]))
    host = draw(st.sampled_from(
        ["example.org", "Example.ORG", "a.b.c", "host:80", "host:443",
         "host:8443"]))
    path = draw(_URL_CHARS)
    params = draw(st.lists(st.sampled_from(
        ["utm_source=x", "utm_x=", "fbclid=1", "gclid=", "msclkid=2",
         "ref=nav", "q=1", "page=2", "refresh=1", "", "plain"]),
        max_size=4))
    frag = draw(st.sampled_from(["", "#f", "#a#b"]))
    u = f"{scheme}://{host}" if scheme else ""
    u += f"/{path}" if path else ""
    if params:
        u += "?" + "&".join(params)
    return u + frag


class TestCanonicalizeProps:
    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, u):
        """canonicalize(canonicalize(u)) == canonicalize(u): the defining
        property of a canonical form — a second pass must find nothing
        left to normalize (no fragment, no default port, no trailing
        slash, no tracking params survive the first pass)."""
        once = _canon_py(u)
        assert _canon_py(once) == once

    @given(urls())
    @settings(max_examples=300, deadline=None)
    def test_no_tracking_survives(self, u):
        out = _canon_py(u)
        q = out.split("?", 1)[1] if "?" in out else ""
        for p in q.split("&"):
            assert not re.match(r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)=", p)

    def test_reference_matches_spark_kernel_on_fixtures(self, spark):
        """The Python transcription above IS the tested semantics: pin it
        to the Spark implementation over a deliberately nasty sample (so
        the two properties above transfer to the Spark column)."""
        from geocode_spark.operators.text import canonicalize_urls

        sample = [
            "HTTPS://Example.ORG/Page/1#frag",
            "https://example.org/a?utm_source=x&q=1&fbclid=z",
            "http://example.org:80/a/",
            "https://example.org:443//",
            "https://host:8443/p?ref=nav&ok=1#x",
            "relative/only/",
            "",
            "ftp://Host/Dir/?utm_a=1",
        ]
        df = spark.createDataFrame([(i, s) for i, s in enumerate(sample)],
                                   "i long, url string")
        got = {r.i: r.canonical_url
               for r in canonicalize_urls(df).collect()}
        for i, s in enumerate(sample):
            assert got[i] == _canon_py(s), s


class TestTokenHashGrouping:
    @given(st.lists(st.text(min_size=1, max_size=30), min_size=1,
                    max_size=50))
    @settings(max_examples=200, deadline=None)
    def test_hash_independent_of_neighbors(self, toks):
        """Each token's hash must depend on that token alone — the
        length-grouped batching (the OOM fix) must never change values.
        Inject a pathological long token and require every other hash to
        stay identical, and compare against a scalar reference fold."""
        h1 = _token_hashes(toks)
        h2 = _token_hashes(toks + ["x" * 5000])
        assert np.array_equal(h1, h2[:len(toks)])
        # scalar reference for the first token (uint64 wraparound IS the
        # mod-2^64 arithmetic — silence numpy's overflow warning)
        t = toks[0]
        with np.errstate(over="ignore"):
            h = np.uint64(0xCBF29CE484222325)
            for cp in t:
                h = (h ^ np.uint64(ord(cp))) * np.uint64(1099511628211)
            h ^= h >> np.uint64(30)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
        assert h1[0] == h
