"""Property-based tests for the from-scratch 7z codec and the metric
distance kernel (no Spark needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geocode_spark.geometry import METERS_PER_DEG, dist_to_polygon_m
from geocode_spark.sources.sevenzip import (_Reader, _write_number, read_7z,
                                            write_7z)


class TestNumberCodec:
    @given(st.integers(min_value=0, max_value=2**64 - 1))
    def test_roundtrip(self, v):
        enc = _write_number(v)
        r = _Reader(enc + b"\x00")
        assert r.number() == v
        assert r.i == len(enc)

    @given(st.integers(min_value=0, max_value=2**64 - 1))
    def test_canonical_prefix_free(self, v):
        """An encoded number never needs lookahead: decoding consumes
        exactly its own bytes regardless of what follows."""
        enc = _write_number(v)
        for tail in (b"", b"\xff" * 9):
            r = _Reader(enc + tail)
            assert r.number() == v and r.i == len(enc)


_names = st.lists(
    st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x2FF,
                                   exclude_characters="\x00/\\"),
            min_size=1, max_size=24),
    min_size=1, max_size=5, unique=True)


class TestArchiveRoundtrip:
    @settings(max_examples=25, deadline=None)
    @given(_names, st.data())
    def test_all_layouts(self, names, data):
        members = {
            n: data.draw(st.binary(min_size=1, max_size=4096), label=n)
            for n in names
        }
        solid = data.draw(st.booleans(), label="solid")
        enc = data.draw(st.booleans(), label="encode_header")
        codec = data.draw(st.sampled_from(["lzma2", "copy"]), label="codec")
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".7z") as f:
            write_7z(f.name, members, codec=codec, solid=solid,
                     encode_header=enc)
            assert read_7z(f.name) == members


class TestMetricDistance:
    @settings(max_examples=200, deadline=None)
    @given(st.floats(-5.0, 5.0), st.floats(45.0, 60.0),
           st.floats(0.01, 1.0), st.floats(0.01, 1.0))
    def test_matches_analytic_box_distance(self, x0, y0, w, h):
        """For an axis-aligned box the kernel must equal the closed-form
        anisotropic point-to-rectangle distance."""
        xs = np.array([x0, x0 + w, x0 + w, x0])
        ys = np.array([y0, y0, y0 + h, y0 + h])
        offs = np.array([0, 4])
        px = np.array([x0 - 0.8, x0 + w / 2, x0 + w + 0.5, x0 + w / 3])
        py = np.array([y0 + h / 2, y0 - 0.4, y0 + h + 0.3, y0 + h / 2])
        got = dist_to_polygon_m(px, py, xs, ys, offs)
        c = np.cos(np.radians(py))
        gx = np.maximum(np.maximum(x0 - px, px - (x0 + w)), 0.0) * c
        gy = np.maximum(np.maximum(y0 - py, py - (y0 + h)), 0.0)
        want = np.sqrt(gx * gx + gy * gy) * METERS_PER_DEG
        # interior point (4th) -> 0 by containment semantics
        assert got[3] == 0.0
        np.testing.assert_allclose(got[:3], want[:3], rtol=1e-9, atol=1e-6)
