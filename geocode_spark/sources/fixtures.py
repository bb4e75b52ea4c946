"""Deterministic synthetic fixtures mirroring the reference's mocked test
setup (/root/reference/Tests/test_geocode.py:46-158) plus a Common-Crawl-style
``pages`` table per BASELINE.json ``input_hint``.

Everything is seed-fixed and synthesized from the golden values already
published in the reference's test suite — no external data. ``build_all``
writes parquet under a base dir (committed at /root/repo/fixtures) so the
DuckDB oracle queries can ``read_parquet`` the same tables the Spark engine
uses.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from pathlib import Path

import numpy as np
import pandas as pd

from ..crs import bng_to_latlon, latlon_to_bng
from ..regions import prepare_regions, save_prepared

FIXTURE_DIR = Path(__file__).resolve().parents[2] / "fixtures"


def _square(x0, y0, x1, y1):
    return [[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]]


# --- region polygon fixtures (Tests/test_geocode.py:50-150) -------------------

LLSOA_RECORDS = [
    {"region_id": "E01012082", "rings": _square(-1.2, 54.5, -1.19, 54.55)},
    {"region_id": "E01011214", "rings": _square(-1.71, 53.66, -1.69, 53.67)},
    {"region_id": "E01002050", "rings": _square(-0.07, 51.57, -0.06, 51.58)},
    {"region_id": "W01000323", "rings": _square(-3.14, 53.20, -3.12, 53.21)},
    # Scottish boundaries are 2011 Output Areas in the reference
    # (ons_nrs.py:249-257); S00101253 relabels to datazone S01008087 when
    # dz=True (the facade default, geocode.py:150) — a observable
    # NON-identity relabel hit by generated points
    {"region_id": "S00101253", "rings": _square(-4.34, 55.94, -4.32, 55.96)},
    {"region_id": "S01008087", "rings": _square(-4.23, 55.91, -4.21, 55.93)},
]

GSP_RECORDS = [
    {"region_id": "BRED_1", "GSPs": "BRED_1", "GSPGroup": "_G",
     "rings": _square(-2.1, 53.3, -2.0, 53.4)},
    {"region_id": "DEWP", "GSPs": "DEWP", "GSPGroup": "_N",
     "rings": _square(-3.2, 55.9, -3.1, 56.0)},
]

# nested squares so golden latlons map to the right NUTS code at each level
# (Tests/test_geocode.py:204-217): point -> UK/UKK/UKK1/UKK15 etc.
_NUTS_POINTS = {
    "UK": (51.3259, -1.9613), "FR": (47.9995, 0.2335), "DE": (50.8356, 8.7343),
}
_NUTS_CODES = {
    "UK": ["UK", "UKK", "UKK1", "UKK15"],
    "FR": ["FR", "FRG", "FRG0", "FRG04"],
    "DE": ["DE", "DE7", "DE72", "DE724"],
}


def nuts_records(level: int, year: int = 2021) -> list[dict]:
    """Per-(level, year) NUTS vintage tables (eurostat.py:38-40 cache keys;
    year kwarg eurostat.py:117-121). The 2016 vintage uses visibly smaller
    squares (same codes, 60% linear size) so year routing is observable:
    points near a 2021 boundary fall OUTSIDE the 2016 regions."""
    recs = []
    for country, (lat, lon) in _NUTS_POINTS.items():
        code = _NUTS_CODES[country][level]
        half = 2.0 / (level + 1)  # shrinking nested squares
        if year == 2016:
            half *= 0.6
        recs.append({
            "region_id": code, "LEVL_CODE": level,
            "rings": _square(lon - half, lat - half, lon + half, lat + half),
        })
    return recs


# --- GSP 20181031 vintage: EPSG:27700 (BNG) source geometry -------------------
# neso.py:303-343 reverse-geocodes this vintage in BNG space (points are
# converted lat/lon -> E/N, neso.py:333); region ids are integers joined to a
# MANY:MANY Region<->GSP<->GNode lookup (neso.py:61-95). Synthetic squares in
# valid GB National Grid ranges.

GSP_20181031_RECORDS = [
    {"region_id": "103", "rings": _square(390000.0, 410000.0,
                                          420000.0, 440000.0)},
    {"region_id": "247", "rings": _square(320000.0, 670000.0,
                                          350000.0, 700000.0)},
]

GSP_LOOKUP_20181031 = [
    # region_id, gsp_name, gnode — region 103 has two gnodes (many:many, J8)
    ("103", "INDQ1", "INDQ"),
    ("103", "INDQ1", "IRON"),
    ("247", "BROX1", "BROX"),
]


# --- postcode dimension (CPO-shaped, cpo.py:60-110 schema) --------------------

GOLDEN_POSTCODES = {
    # postcode -> golden (lat, lon) from Tests/test_geocode.py:255-260
    "RG1 3PE": (51.45511, -0.94070),
    "S10 2FR": (53.37708, -1.48700),
    "FY2 0RD": (53.83989, -3.04328),
}


def build_cpo() -> pd.DataFrame:
    """CPO-shaped table. E/N derived by inverse-transforming golden lat/lons
    with our own latlon_to_bng, so the pipeline's forward transform
    reproduces the golden values to well under 4 dp (roundtrip < 1e-7 deg).

    Adds multi-unit postcodes sharing a code (exercises the nanmean agg,
    cpo.py:162-172) and extra units per outward for the partial-postcode
    prefix fallback (cpo.py:217-228).
    """
    rng = np.random.default_rng(42)
    rows = []
    for pc, (lat, lon) in GOLDEN_POSTCODES.items():
        e, n = latlon_to_bng(np.array([lat]), np.array([lon]))
        rows.append((pc.replace(" ", "").upper(), 10, int(round(e[0])), int(round(n[0]))))
    # synthetic neighbourhoods: 40 postcodes per outward; LS1/WG1 sit inside
    # fixture LLSOA squares and GS1 inside the BRED_1 GSP square so the
    # document pipeline's spatial-join stage produces positive assignments
    base = {"AB1": (57.14, -2.10, 0.01), "CD2": (52.20, 0.12, 0.01),
            "EF3": (55.95, -3.19, 0.01), "GH4": (53.48, -2.24, 0.01),
            "ZZ9": (51.50, -0.12, 0.01),
            "LS1": (54.52, -1.195, 0.004),   # inside E01012082
            "WG1": (53.205, -3.13, 0.004),   # inside W01000323
            "GS1": (53.35, -2.05, 0.01)}     # inside GSP BRED_1
    letters = "ABDEFGHJLNPQRSTUWXYZ"
    for ow, (lat0, lon0, jit) in base.items():
        for i in range(40):
            inward = f"{i % 10}{letters[i % 20]}{letters[(i * 7) % 20]}"
            dlat = (rng.random() - 0.5) * 2 * jit
            dlon = (rng.random() - 0.5) * 2 * jit
            e, n = latlon_to_bng(np.array([lat0 + dlat]), np.array([lon0 + dlon]))
            rows.append((f"{ow}{inward}", 10, int(round(e[0])), int(round(n[0]))))
    # duplicate-unit postcode: same code twice with different E/N (nanmean case)
    e1, n1 = latlon_to_bng(np.array([54.0]), np.array([-1.5]))
    e2, n2 = latlon_to_bng(np.array([54.001]), np.array([-1.501]))
    rows.append(("DUP1AA", 10, int(round(e1[0])), int(round(n1[0]))))
    rows.append(("DUP1AA", 10, int(round(e2[0])), int(round(n2[0]))))
    # zero-coordinate row (dropped by P1) and a high-PQI row
    rows.append(("XX00XX", 10, 0, 0))
    rows.append(("NP99ZZ", 90, 355000, 180000))
    df = pd.DataFrame(rows, columns=["Postcode", "Positional_quality_indicator",
                                     "Eastings", "Northings"])
    return df


# --- centroid lookups (golden values, Tests/test_geocode.py:160-249) ----------

LLSOA_CENTROIDS = [
    ("E01012082", 54.5477949315505, -1.19562636315068),
    ("E01011214", 53.6669451917253, -1.70300404181518),
    ("E01002050", 51.5787798943552, -0.06847625193368),
    ("W01000323", 53.2072680650806, -3.13215047150594),
    ("S00101253", 55.9449262044360, -4.33345100983174),
    ("S01008087", 55.9183658877035, -4.21934323024909),
    ("S01020873", 55.9341580155129, -3.46004249282003),
]

CONSTITUENCY_CENTROIDS = [
    ("E14000882", "Poplar and Limehouse", -0.015729999, 51.507938),
    ("E14000575", "Blyth Valley", -1.56095, 55.092758),
    ("E14000530", "Aldershot", -0.7841, 51.288952),
]

LAD_CENTROIDS = [
    ("E06000035", "Medway", 0.56317401, 51.44772),
    ("E07000027", "Barrow-in-Furness", -3.1998999, 54.15731),
    ("N09000005", "Derry City and Strabane", -7.42064, 54.80904),
]

DATAZONE_LOOKUP = [
    # llsoa (OA) code -> datazone (ons_nrs.py:279-291; relabel ons_nrs.py:387-394)
    # Scottish-only, like the real NRS lookup: with the facade's dz=True
    # default the reference's English/Welsh golden values must pass through
    # unchanged. S00101253 -> S01008087 is the observable non-identity map.
    ("S01008087", "S01008087"),
    ("S00101253", "S01008087"),
]

GSP_LOOKUP = [
    # region_id, GSPs, gnode, dno (neso.py:61-95; >=1 region with 2 gnodes, J8)
    ("BRED_1", "BRED_1", "BRED1", "14"),
    ("BRED_1", "BRED_1", "BRED2", "14"),
    ("DEWP", "DEWP", "DEWP1", "18"),
]


def build_pc_llsoa_lookup() -> pd.DataFrame:
    """Postcode -> LLSOA lookup (ons_nrs.py:516-535 shape: all-string pcds
    plus normalized postcode key). Maps the golden postcodes and the AB1
    neighbourhood onto fixture LLSOA codes."""
    rows = [
        ("RG1 3PE", "E01002050"), ("S10 2FR", "E01011214"),
        ("FY2 0RD", "W01000323"), ("DUP 1AA", "E01012082"),
    ]
    cpo = build_cpo()
    codes = [c for c, *_ in LLSOA_CENTROIDS]
    for i, pc in enumerate(sorted(cpo[cpo["Eastings"] > 0]["Postcode"].unique())):
        rows.append((pc[:-3] + " " + pc[-3:], codes[i % len(codes)]))
    df = pd.DataFrame(rows, columns=["pcds", "lsoa11cd"]).drop_duplicates("pcds")
    df["postcode"] = df["pcds"].str.strip().str.upper().str.replace(" ", "", regex=False)
    return df.drop_duplicates("postcode")


# --- pages fact table (BASELINE.json input_hint) ------------------------------

def build_cpo_geo() -> pd.DataFrame:
    """The prepared CPO dimension exactly as operators.forward_geocode.
    prepare_cpo computes it (P1 drop, P2 quirk mask, BNG->WGS84, outward/
    inward split) — materialized so the DuckDB oracle can join against it.
    A pytest asserts Spark's prepare_cpo output equals this table."""
    df = build_cpo().copy()
    df["Postcode"] = df["Postcode"].str.replace(" ", "", regex=False).str.upper()
    df = df[~((df["Eastings"] == 0) & (df["Northings"] == 0))].reset_index(drop=True)
    # P2 quirk: (Eastings.notnull() & PQI) < 90  ==  (1 & PQI) < 90
    mask = (df["Eastings"].notnull().astype(int) & df["Positional_quality_indicator"]) < 90
    lat = np.full(len(df), np.nan)
    lon = np.full(len(df), np.nan)
    la, lo = bng_to_latlon(df.loc[mask, "Eastings"].to_numpy(np.float64),
                           df.loc[mask, "Northings"].to_numpy(np.float64))
    lat[mask.to_numpy()] = la
    lon[mask.to_numpy()] = lo
    df["latitude"] = lat
    df["longitude"] = lon
    df["outward_postcode"] = df["Postcode"].str.slice(0, -3).str.strip()
    df["inward_postcode"] = df["Postcode"].str.slice(-3).str.strip()
    return df


def build_pages(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    """Common-Crawl-style pages with deterministic UK postcodes and lat/lon
    mentions embedded in ``text``. Byte-identical text per url (invariant)."""
    rng = np.random.default_rng(seed)
    cpo = build_cpo()
    pcs = cpo[cpo["Eastings"] > 0]["Postcode"].unique()
    fill = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()
    rows = []
    for i in range(n):
        words = list(rng.choice(fill, size=12))
        n_pc = int(rng.integers(0, 3))
        for _ in range(n_pc):
            pc = str(rng.choice(pcs))
            # embed with the canonical space: outward + " " + inward
            words.insert(int(rng.integers(0, len(words))), f"{pc[:-3]} {pc[-3:]}")
        text = " ".join(words)
        url = f"https://example.org/page/{i}"
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=int(rng.integers(0, 86400 * 30)))
        html = ("<html><body>" + text + "</body></html>").encode()
        lang = "en" if rng.random() < 0.9 else str(rng.choice(["fr", "de", "es"]))
        rows.append((url, ts, html, text, lang))
    # inject exact duplicates (same text/html, new url) so dedup operators
    # have real work: every 40th page is mirrored once
    for i in range(0, n, 40):
        url, ts, html, text, lang = rows[i]
        rows.append((f"https://mirror.example.net/copy/{i}", ts, html, text, lang))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    # Spark cannot read TIMESTAMP(NANOS) parquet — write microseconds
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    return df


# Adam7 pass layout transcribed from the PNG spec — a GENERATION-side
# serializer (like encode_*), so decode is never consulted for goldens.
_ADAM7_PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_blob(w, h, depth, ctype, raw, interlace=0, plte=None, trns=None):
    """Hand-serialize a PNG (filter-0 scanlines already packed in `raw`)
    for the palette / interlaced fixture kinds the filter-0 truecolor
    `encode_png` can't express."""
    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        blob += chunk(b"PLTE", plte)
    if trns is not None:
        blob += chunk(b"tRNS", trns)
    return blob + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def _gif_blob(w, h, pal, indices, interlace=False, transparent=None):
    """Hand-serialize a single-frame GIF89a with an 'uncompressed' LZW
    stream (every pixel a root code, CLEAR before the width could grow)
    — generation-side, so decode is never consulted for goldens."""
    n_pal = pal.shape[0]
    bits = max(1, (n_pal - 1).bit_length())
    mcs = max(2, bits)
    clear, width = 1 << mcs, mcs + 1
    codes = [clear]
    since = 0
    flat = indices.ravel()
    if interlace:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        flat = indices[order].ravel()
    for v in flat:
        if since == clear - 2:
            codes.append(clear)
            since = 0
        codes.append(int(v))
        since += 1
    codes.append(clear + 1)  # EOI
    acc = nb = 0
    lzw = bytearray()
    for c in codes:  # LSB-first packing, constant width
        acc |= c << nb
        nb += width
        while nb >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        lzw.append(acc & 0xFF)
    gct = pal.tobytes() + b"\x00" * ((1 << bits) * 3 - 3 * n_pal)
    blob = (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | (bits - 1), 0, 0]) + gct)
    if transparent is not None:
        blob += b"\x21\xf9\x04" + bytes([1, 0, 0, transparent]) + b"\x00"
    blob += (b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
             + bytes([0x40 if interlace else 0, mcs]))
    for s in range(0, len(lzw), 255):
        blob += bytes([len(lzw[s:s + 255])]) + bytes(lzw[s:s + 255])
    return blob + b"\x00\x3b"


def _jpeg_prog_blob(y: np.ndarray) -> bytes:
    """Hand-serialize a PROGRESSIVE (SOF2) grayscale JPEG for a
    flat-8x8-tile image: DC-first (Al=1) + DC-refine scans carry the
    whole picture, then one AC scan that is a single EOB run over every
    block (all ACs are zero in this class). Generation-side: struct +
    a local MSB-first bit packer with byte stuffing, never the decoder.
    Quantization is exact (DC step 8, flat tile -> DC = v-128), so
    decode must recover every source value bit-for-bit."""
    h, w = y.shape
    bh, bw = -(-h // 8), -(-w // 8)
    assert h % 8 == 0 and w % 8 == 0, "flat-tile class is 8-aligned"
    dcs = (y[::8, ::8].astype(np.int64) - 128).ravel()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    def scan_bits(emit):
        acc, nb, out = 0, 0, bytearray()
        def put(code, width):
            nonlocal acc, nb
            for i in range(width - 1, -1, -1):
                acc = (acc << 1) | ((code >> i) & 1)
                nb += 1
                if nb == 8:
                    out.append(acc)
                    if acc == 0xFF:
                        out.append(0x00)  # byte stuffing
                    acc, nb = 0, 0
        emit(put)
        while nb:  # 1-pad the final byte
            put(1, 1)
        return bytes(out)

    def dc_first(put):
        prev = 0
        for dc in dcs:
            d1 = int(dc) >> 1          # arithmetic shift, Al=1 semantics
            diff = d1 - prev
            prev = d1
            cat = abs(diff).bit_length()
            put(cat, 4)                # DC table: category c -> code c
            if cat:
                put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)

    def dc_refine(put):
        for dc in dcs:
            put(int(dc) & 1, 1)

    def ac_eobrun(put):
        n_blocks = bh * bw
        r = n_blocks.bit_length() - 1  # EOBRUN = (1<<r) + extra covers all
        put(r, 4)                      # AC table: EOB(r) -> code r
        if r:
            put(n_blocks - (1 << r), r)

    dqt = bytes([0x00, 8]) + bytes([1] * 63)
    dc_tab = bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) \
        + bytes(range(12))                       # 12 categories, 4 bits
    ac_tab = bytes([0x10]) + bytes([0, 0, 0, 15] + [0] * 12) \
        + bytes((r << 4) for r in range(15))     # EOB(0..14), 4 bits
    return (b"\xff\xd8" + seg(0xDB, dqt)
            + seg(0xC2, struct.pack(">BHHB", 8, h, w, 1)
                  + struct.pack(">BBB", 1, 0x11, 0))
            + seg(0xC4, dc_tab + ac_tab)
            + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
            + scan_bits(dc_first)
            + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
            + scan_bits(dc_refine)
            + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
            + scan_bits(ac_eobrun)
            + b"\xff\xd9")


def _avi_blob(w: int, h: int, us_per_frame: int,
              jpeg_frames: list[bytes]) -> bytes:
    """Hand-serialize a single-video-stream MJPEG AVI (generation-side
    struct packing, independent of the engine's RIFF walk): RIFF('AVI ')
    -> LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER)) -> LIST movi ('00dc' word-aligned frame chunks)
    -> idx1."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    total = len(jpeg_frames)
    buf_sz = max(len(f) for f in jpeg_frames)
    avih = struct.pack("<10I", us_per_frame, 0, 0, 0x10, total, 0, 1,
                       buf_sz, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            us_per_frame, 1_000_000, 0,
                                            total, buf_sz, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    idx, off = [], 4
    for f in jpeg_frames:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    body = hdrl + lst(b"movi", movi_body) + chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _mp3_blob(rng, n_frames: int, sr_idx: int, br_idx: int,
              stereo: bool, id3v2: bool, id3v1: bool
              ) -> tuple[bytes, list[bytes], int]:
    """Hand-serialize an MPEG-1 Layer III stream (generation-side spec
    transcription: ISO 11172-3 header fields + frame-length formula):
    optional ID3v2 tag, n CBR frames with deterministic payload bytes
    (alternating padding slots), optional trailing ID3v1 block. Returns
    (payload, frame_bytes_list, sample_rate) — the goldens hash the
    exact frames the walk must recover."""
    sr = (44100, 48000, 32000)[sr_idx]
    kbps = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
            160, 192, 224, 256, 320)[br_idx]
    frames = []
    for j in range(n_frames):
        pad = j & 1
        # 0xFF 0xFB: sync + MPEG1 (11) + Layer III (01) + no-CRC (1)
        b2 = 0xFB
        b3 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
        b4 = (0x00 if stereo else 0xC0) | 0x04  # mode + original bit
        ln = 144 * kbps * 1000 // sr + pad
        frames.append(bytes([0xFF, b2, b3, b4]) + rng.bytes(ln - 4))
    head = b""
    if id3v2:
        tag = b"TXXX" + rng.bytes(int(rng.integers(20, 120)))
        sz = len(tag)
        head = (b"ID3\x04\x00\x00"
                + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                         (sz >> 7) & 0x7F, sz & 0x7F]) + tag)
    tail = b"TAG" + rng.bytes(125) if id3v1 else b""
    return head + b"".join(frames) + tail, frames, sr


def _sample_idx(total: int, n: int) -> list[int]:
    """Transcription of the engine's even-frame-resampling rule
    (functions/media._sample_indices) for golden generation."""
    if total <= n:
        return list(range(total))
    return [j * total // n for j in range(n)]


def build_media(n: int = 144, seed: int = 42, feat_dim: int = 16,
                resize_wh: tuple[int, int] = (8, 6), n_frames: int = 4):
    """Deterministic multimodal corpus + GENERATION-TIME goldens.

    Returns (media, meta_golden, features_golden, resize_golden,
    frames_golden) DataFrames. Payloads are real format bytes produced by
    the functions/media encoders; every golden value is computed from the
    SOURCE arrays / generation parameters, never by running the byte
    DECODERS — so the driver's media queries prove that
    bytes -> decode recovers the generation truth end-to-end. Kinds cycle
    through BMP, the four truecolor/grey PNG color types, depth-4 palette
    PNG (PLTE, alternating tRNS alpha), Adam7-interlaced RGB PNG, 16-bit
    RGB PNG (strip-16 high-byte golden), GIF89a (rotating plain /
    interlaced / transparent variants), baseline
    JPEG (grayscale and 4:2:0 YCbCr), progressive JPEG (SOF2 flat
    tiles), mono/stereo WAV at several sample
    rates, MJPEG AVI video (flat-tile grayscale JPEG frames in a
    hand-serialized RIFF container), MPEG-1 Layer III audio (CBR frame
    runs with rotating ID3v2/ID3v1 tag variants, hand-serialized), and
    plain binary blobs; one trailing row has a NULL payload
    (null-handling coverage). The palette/interlaced PNG, GIF and
    progressive-JPEG payloads are serialized by ``_png_blob`` /
    ``_gif_blob`` / ``_jpeg_prog_blob`` (generation-side
    struct/zlib/LZW/bit-packing, not the engine's decoders).

    JPEG is lossy, so its fixtures are drawn from the class where
    baseline JPEG is exactly lossless end-to-end: images flat per 8x8
    tile (16x16 for 4:2:0 color, whose chroma is flat per 8x8 block in
    subsampled space) with a DC quantization step of 8 — the FDCT of a
    flat block is a lone DC coefficient that quantizes without rounding
    loss, so decode must recover every source value bit-for-bit. Color
    sources are generated in YCbCr space; the golden RGB is computed
    HERE from those planes via an inline transcription of the JFIF
    color formula and the decoder's box-replication index mapping —
    pure generation-time arithmetic, never a decoder call."""
    from ..functions.media import (encode_bmp, encode_jpeg, encode_png,
                                   encode_wav, sniff)

    rng = np.random.default_rng(seed)
    kinds = ["bmp", "png_gray", "png_rgb", "png_ga", "png_rgba",
             "png_pal", "png_adam7", "png16", "gif",
             "jpeg_gray", "jpeg_420", "jpeg_prog",
             "wav_mono", "wav_stereo", "avi", "mp3", "bin"]
    rw, rh = resize_wh

    def flat_tiles(h, w, tile):
        t = rng.integers(0, 256, (-(-h // tile), -(-w // tile)),
                         dtype=np.uint8)
        return np.repeat(np.repeat(t, tile, 0), tile, 1)[:h, :w]

    def luma_hist(arr):
        a = arr.astype(np.int64)
        if a.shape[2] >= 3:
            luma = (299 * a[..., 0] + 587 * a[..., 1]
                    + 114 * a[..., 2]) // 1000
        else:
            luma = a[..., 0]
        hist, _ = np.histogram(luma, bins=feat_dim, range=(0, 256))
        return hist / hist.sum()

    media, meta_g, feat_g, resize_g, frames_g = [], [], [], [], []
    for i in range(n):
        kind = kinds[i % len(kinds)]
        meta = {"media_id": i, "media_type": "binary",
                "n_bytes": 0, "width": None, "height": None,
                "duration_ms": None}
        if kind.startswith(("png", "jpeg")) or kind in ("bmp", "gif"):
            if kind == "jpeg_gray":
                h = int(rng.integers(4, 41))
                w = int(rng.integers(4, 41))
                src = flat_tiles(h, w, 8)[:, :, None]
                payload = encode_jpeg(src[:, :, 0])
            elif kind == "jpeg_prog":
                # progressive (SOF2) flat tiles, hand-serialized by
                # _jpeg_prog_blob — exact DC-only recovery
                h = int(rng.integers(1, 6)) * 8
                w = int(rng.integers(1, 6)) * 8
                src = flat_tiles(h, w, 8)[:, :, None]
                payload = _jpeg_prog_blob(src[:, :, 0])
            elif kind == "jpeg_420":
                h = int(rng.integers(8, 49))
                w = int(rng.integers(8, 49))
                y = flat_tiles(h, w, 16)
                ch2, cw2 = -(-h // 2), -(-w // 2)
                cb = flat_tiles(ch2, cw2, 8)
                cr = flat_tiles(ch2, cw2, 8)
                payload = encode_jpeg(y, cb, cr, sampling=(2, 2))
                # golden RGB: JFIF color formula + the decoder's
                # box-replication index mapping, transcribed inline
                ui, xi = np.arange(h) // 2, np.arange(w) // 2
                yf = y.astype(np.float64)
                cbf = cb[ui][:, xi].astype(np.float64) - 128.0
                crf = cr[ui][:, xi].astype(np.float64) - 128.0
                rgb = np.stack([yf + 1.402 * crf,
                                yf - 0.344136 * cbf - 0.714136 * crf,
                                yf + 1.772 * cbf], axis=-1)
                src = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
            elif kind == "png_pal":
                # depth-4 palette (<=16 entries); alternate rows of the
                # cycle carry a tRNS alpha table -> RGBA golden
                w = int(rng.integers(4, 21))
                h = int(rng.integers(4, 21))
                n_pal = int(rng.integers(2, 17))
                pal = rng.integers(0, 256, (n_pal, 3), dtype=np.uint8)
                idx = rng.integers(0, n_pal, (h, w), dtype=np.uint8)
                raw = b""
                for row in idx:  # pack 4-bit indices MSB-first per row
                    nib = row if len(row) % 2 == 0 \
                        else np.append(row, np.uint8(0))
                    raw += b"\x00" + ((nib[0::2] << 4)
                                      | nib[1::2]).astype(np.uint8).tobytes()
                src, trns = pal[idx], None
                if (i // len(kinds)) % 2:
                    alpha = rng.integers(0, 256, n_pal, dtype=np.uint8)
                    trns = alpha.tobytes()
                    src = np.dstack([src, alpha[idx]])
                payload = _png_blob(w, h, 4, 3, raw, plte=pal.tobytes(),
                                    trns=trns)
            elif kind == "png16":
                # 16-bit RGB: golden is the strip-16 high byte of each
                # big-endian source sample (the decoder's documented fold)
                w = int(rng.integers(4, 21))
                h = int(rng.integers(4, 21))
                src16 = rng.integers(0, 1 << 16, (h, w, 3), dtype=np.uint16)
                raw = b"".join(b"\x00" + row.astype(">u2").tobytes()
                               for row in src16)
                src = (src16 >> 8).astype(np.uint8)
                payload = _png_blob(w, h, 16, 2, raw)
            elif kind == "gif":
                # GIF89a: rotate through plain / interlaced / transparent
                # variants; golden src = palette lookup (+ alpha column
                # when a transparent index is declared)
                w = int(rng.integers(4, 21))
                h = int(rng.integers(4, 21))
                n_pal = int(rng.integers(2, 17))
                pal = rng.integers(0, 256, (n_pal, 3), dtype=np.uint8)
                idx = rng.integers(0, n_pal, (h, w), dtype=np.uint8)
                variant = (i // len(kinds)) % 3
                interlace = variant == 1
                transparent = int(rng.integers(0, n_pal)) \
                    if variant == 2 else None
                payload = _gif_blob(w, h, pal, idx, interlace=interlace,
                                    transparent=transparent)
                src = pal[idx]
                if transparent is not None:
                    alpha = np.where(idx == transparent, 0,
                                     255).astype(np.uint8)
                    src = np.dstack([src, alpha])
            elif kind == "png_adam7":
                w = int(rng.integers(4, 21))
                h = int(rng.integers(4, 21))
                src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                raw = b""
                for x0, y0, dx, dy in _ADAM7_PASSES:
                    sub = src[y0::dy, x0::dx, :]
                    if sub.shape[0] and sub.shape[1]:
                        for row in sub:
                            raw += b"\x00" + row.tobytes()
                payload = _png_blob(w, h, 8, 2, raw, interlace=1)
            else:
                w = int(rng.integers(4, 21))
                h = int(rng.integers(4, 21))
                ch = {"bmp": 3, "png_gray": 1, "png_rgb": 3, "png_ga": 2,
                      "png_rgba": 4}[kind]
                src = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
                payload = (encode_bmp(src) if kind == "bmp"
                           else encode_png(src))
            meta.update(media_type="image", width=w, height=h)
            feat_g.append({"media_id": i,
                           "features": luma_hist(src).tolist()})
            yi = (np.arange(rh, dtype=np.int64) * h) // rh
            xi = (np.arange(rw, dtype=np.int64) * w) // rw
            resized = encode_bmp(src[yi][:, xi])
            resize_g.append({
                "media_id": i,
                "resized_sha": hashlib.sha256(resized).hexdigest(),
                "resized_width": rw, "resized_height": rh})
        elif kind.startswith("wav"):
            channels = 1 if kind == "wav_mono" else 2
            rate = int(rng.choice([8000, 16000, 44100]))
            n_samples = int(rng.integers(500, 3000))
            src = rng.integers(-32768, 32768,
                               (n_samples, channels)).astype(np.int16)
            payload = encode_wav(src, rate)
            meta.update(media_type="audio",
                        duration_ms=(n_samples * 1000) // rate)
            hist, _ = np.histogram(src, bins=feat_dim,
                                   range=(-32768, 32768))
            feat_g.append({"media_id": i,
                           "features": (hist / hist.sum()).tolist()})
            bounds = [j * n_samples // n_frames for j in range(n_frames + 1)]
            for fi, (a, b) in enumerate(
                    p for p in zip(bounds, bounds[1:]) if p[1] > p[0]):
                fb = src[a:b].tobytes()
                frames_g.append({
                    "media_id": i, "frame_idx": fi,
                    "frame_n_bytes": len(fb),
                    "frame_sha": hashlib.sha256(fb).hexdigest()})
        elif kind == "avi":
            # MJPEG video: frames from the lossless flat-tile grayscale
            # JPEG class, so frame DECODE goldens are exact; the frames
            # golden hashes the exact chunk bytes placed in the container
            h = int(rng.integers(8, 33))
            w = int(rng.integers(8, 33))
            total = int(rng.integers(3, 11))
            uspf = int(rng.choice([33333, 40000, 100000]))
            srcs = [flat_tiles(h, w, 8) for _ in range(total)]
            jpegs = [encode_jpeg(s) for s in srcs]
            payload = _avi_blob(w, h, uspf, jpegs)
            meta.update(media_type="video", width=w, height=h,
                        duration_ms=(total * uspf) // 1000)
            # features: engine decodes the FIRST sampled frame (index 0)
            feat_g.append({"media_id": i,
                           "features": luma_hist(
                               srcs[0][:, :, None]).tolist()})
            for fi, si in enumerate(_sample_idx(total, n_frames)):
                frames_g.append({
                    "media_id": i, "frame_idx": fi,
                    "frame_n_bytes": len(jpegs[si]),
                    "frame_sha": hashlib.sha256(jpegs[si]).hexdigest()})
        elif kind == "mp3":
            variant = (i // len(kinds)) % 4
            payload, mframes, rate = _mp3_blob(
                rng, n_frames=int(rng.integers(6, 31)),
                sr_idx=int(rng.integers(0, 3)),
                br_idx=int(rng.integers(1, 15)),
                stereo=bool(variant & 1), id3v2=variant >= 2,
                id3v1=variant == 3)
            meta.update(media_type="audio",
                        duration_ms=(len(mframes) * 1152 * 1000) // rate)
            # features: MP3 has no PCM decode -> engine byte-hist fallback
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=feat_dim, range=(0, 256))
            feat_g.append({"media_id": i,
                           "features": (hist / hist.sum()).tolist()})
            for fi, si in enumerate(_sample_idx(len(mframes), n_frames)):
                frames_g.append({
                    "media_id": i, "frame_idx": fi,
                    "frame_n_bytes": len(mframes[si]),
                    "frame_sha": hashlib.sha256(
                        mframes[si]).hexdigest()})
        else:
            payload = rng.bytes(int(rng.integers(16, 400)))
            assert sniff(payload) is None, "blob accidentally sniffs as media"
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=feat_dim, range=(0, 256))
            s = hist.sum()
            feat_g.append({"media_id": i,
                           "features": (hist / s).tolist()})
        meta["n_bytes"] = len(payload)
        media.append({"media_id": i, "kind": kind, "payload": payload})
        meta_g.append(meta)
    # NULL payload row: decode must yield (NULL type, 0 bytes, NULL dims)
    media.append({"media_id": n, "kind": "null", "payload": None})
    meta_g.append({"media_id": n, "media_type": None, "n_bytes": 0,
                   "width": None, "height": None, "duration_ms": None})
    feat_g.append({"media_id": n, "features": [0.0] * feat_dim})

    meta_df = pd.DataFrame(meta_g)
    meta_df["width"] = meta_df["width"].astype("Int32")
    meta_df["height"] = meta_df["height"].astype("Int32")
    meta_df["duration_ms"] = meta_df["duration_ms"].astype("Int64")
    return (pd.DataFrame(media), meta_df, pd.DataFrame(feat_g),
            pd.DataFrame(resize_g), pd.DataFrame(frames_g))


def complex_region_records(n_regions: int = 64, n_vertices: int = 400,
                           seed: int = 7) -> list[dict]:
    """Realistic-complexity synthetic regions for benchmarking: jittered
    star-convex polygons (~n_vertices each, like real LLSOA boundaries)
    tiled over an 8x8 grid near the UK. Deterministic."""
    rng = np.random.default_rng(seed)
    recs = []
    grid = int(np.ceil(np.sqrt(n_regions)))
    for r in range(n_regions):
        gx, gy = r % grid, r // grid
        cx = -6.0 + gx * 0.5
        cy = 50.0 + gy * 0.5
        ang = np.linspace(0, 2 * np.pi, n_vertices, endpoint=False)
        rad = 0.2 * (1.0 + 0.35 * np.sin(ang * rng.integers(3, 9))
                     + 0.1 * rng.standard_normal(n_vertices).cumsum() / np.sqrt(n_vertices))
        rad = np.clip(np.abs(rad), 0.03, 0.24)
        xs = cx + rad * np.cos(ang)
        ys = cy + rad * np.sin(ang)
        recs.append({"region_id": f"CPLX{r:04d}",
                     "rings": [list(zip(xs.tolist(), ys.tolist()))]})
    return recs


def _pip_pnpoly(px: float, py: float, edges) -> bool:
    """INDEPENDENT even-odd point-in-polygon: the classic pnpoly
    crossing-abscissa form (x < x1 + (py-y1)(x2-x1)/(y2-y1)), vs the
    engine's y-bucketed t/dy expression tree (geometry.py). Same rule,
    different derivation — ties only on measure-zero inputs."""
    ex1, ey1, ex2, ey2 = edges
    straddle = (ey1 > py) != (ey2 > py)
    if not straddle.any():
        return False
    x1, y1 = ex1[straddle], ey1[straddle]
    x2, y2 = ex2[straddle], ey2[straddle]
    xc = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    return bool(np.count_nonzero(px < xc) & 1)


def _any_edge_hits_rect(edges, rx0, ry0, rx1, ry1) -> bool:
    """INDEPENDENT segment-vs-rect: Liang-Barsky parametric clipping
    (non-empty clipped interval = intersection, touches inclusive), vs
    the engine's separating-axis corner-side test (geometry.py:303).
    Both are exact for segment-vs-AABB; they differ only on degenerate
    tangencies."""
    ex1, ey1, ex2, ey2 = edges
    dx, dy = ex2 - ex1, ey2 - ey1
    t0 = np.zeros_like(dx)
    t1 = np.ones_like(dx)
    ok = np.ones(dx.shape, dtype=bool)
    for p, q in ((-dx, ex1 - rx0), (dx, rx1 - ex1),
                 (-dy, ey1 - ry0), (dy, ry1 - ey1)):
        para = p == 0.0
        ok &= ~(para & (q < 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(para, 0.0, q / np.where(para, 1.0, p))
        t0 = np.where(~para & (p < 0.0), np.maximum(t0, t), t0)
        t1 = np.where(~para & (p > 0.0), np.minimum(t1, t), t1)
    return bool((ok & (t0 <= t1)).any())


def _interleave26(v: int) -> int:
    """Bit-at-a-time Morton interleave — independent of the engine's
    parallel-prefix mask cascade (cells.py:_part1by1)."""
    out = 0
    for b in range(26):
        out |= ((v >> b) & 1) << (2 * b)
    return out


def build_raster_golden(recs: list | None = None, res: int = 13
                        ) -> pd.DataFrame:
    """GENERATION-TIME truth for the raster_tiling query: rasterize the
    complex fixture polygons with an INDEPENDENT transcription of the
    covering rule (kept iff an edge crosses the cell OR its center is
    inside; interior iff center-in and no edge crosses — the rule
    cells.covering_cells documents). PIP is pnpoly, edge-vs-rect is
    Liang-Barsky, the cell id is a bit-loop Morton encode — none of the
    engine's kernels run here. Columns: region_id, cell_id, i, j,
    interior."""
    recs = complex_region_records() if recs is None else recs
    n = 1 << res
    lon_step, lat_step = 360.0 / n, 180.0 / n
    rows = []
    for rec in recs:
        e1x, e1y, e2x, e2y = [], [], [], []
        for ring in rec["rings"]:
            pts = np.asarray(ring, dtype=np.float64)
            nxt = np.roll(pts, -1, axis=0)
            e1x.append(pts[:, 0])
            e1y.append(pts[:, 1])
            e2x.append(nxt[:, 0])
            e2y.append(nxt[:, 1])
        edges = (np.concatenate(e1x), np.concatenate(e1y),
                 np.concatenate(e2x), np.concatenate(e2y))
        allx = np.concatenate([edges[0], edges[2]])
        ally = np.concatenate([edges[1], edges[3]])
        i0 = max(int(np.floor((allx.min() + 180.0) / lon_step)), 0)
        i1 = min(int(np.floor((allx.max() + 180.0) / lon_step)), n - 1)
        j0 = max(int(np.floor((ally.min() + 90.0) / lat_step)), 0)
        j1 = min(int(np.floor((ally.max() + 90.0) / lat_step)), n - 1)
        for i in range(i0, i1 + 1):
            rx0 = i * lon_step - 180.0
            rx1 = rx0 + lon_step
            for j in range(j0, j1 + 1):
                ry0 = j * lat_step - 90.0
                ry1 = ry0 + lat_step
                crossed = _any_edge_hits_rect(edges, rx0, ry0, rx1, ry1)
                center_in = _pip_pnpoly((rx0 + rx1) * 0.5, (ry0 + ry1) * 0.5,
                                        edges)
                if crossed or center_in:
                    cell = ((res << 58) | _interleave26(i)
                            | (_interleave26(j) << 1))
                    rows.append({"region_id": rec["region_id"],
                                 "cell_id": cell, "i": i, "j": j,
                                 "interior": bool(center_in and not crossed)})
    return pd.DataFrame(rows)


def build_all(base_dir: str | Path = FIXTURE_DIR,
              prepared_dir: str | Path | None = None) -> None:
    """Write every fixture parquet + prepared region artifacts (the latter
    under ``prepared_dir``, default ``<base>/prepared``)."""
    base = Path(base_dir)
    base.mkdir(parents=True, exist_ok=True)

    build_cpo().to_parquet(base / "cpo_raw.parquet", index=False)
    build_cpo_geo().to_parquet(base / "cpo_geo.parquet", index=False)
    build_pages().to_parquet(base / "pages.parquet", index=False)

    media, meta_g, feat_g, resize_g, frames_g = build_media()
    media.to_parquet(base / "media.parquet", index=False)
    meta_g.to_parquet(base / "media_meta_golden.parquet", index=False)
    feat_g.to_parquet(base / "media_features_golden.parquet", index=False)
    resize_g.to_parquet(base / "media_resize_golden.parquet", index=False)
    frames_g.to_parquet(base / "media_frames_golden.parquet", index=False)

    pd.DataFrame(LLSOA_CENTROIDS, columns=["code", "latitude", "longitude"]) \
        .to_parquet(base / "llsoa_centroids.parquet", index=False)
    pd.DataFrame(CONSTITUENCY_CENTROIDS, columns=["id", "name", "longitude", "latitude"]) \
        .to_parquet(base / "constituency_centroids.parquet", index=False)
    pd.DataFrame(LAD_CENTROIDS, columns=["id", "name", "longitude", "latitude"]) \
        .to_parquet(base / "lad_centroids.parquet", index=False)
    pd.DataFrame(DATAZONE_LOOKUP, columns=["llsoa_code", "datazone"]) \
        .to_parquet(base / "datazone_lookup.parquet", index=False)
    pd.DataFrame(GSP_LOOKUP, columns=["region_id", "GSPs", "gnode", "dno"]) \
        .to_parquet(base / "gsp_lookup.parquet", index=False)
    build_pc_llsoa_lookup().to_parquet(base / "pc_llsoa_lookup.parquet", index=False)

    # region tables: flat bbox form for the SQL oracle (axis-aligned squares
    # => bbox containment IS polygon containment), prepared form for the engine
    def flat(records, extra=()):
        rows = []
        for seq, rec in enumerate(records):
            ring = rec["rings"][0]
            xs = [p[0] for p in ring]
            ys = [p[1] for p in ring]
            rows.append({
                "region_id": rec["region_id"], "region_seq": seq,
                "xmin": min(xs), "ymin": min(ys), "xmax": max(xs), "ymax": max(ys),
                **{k: rec[k] for k in extra},
            })
        return pd.DataFrame(rows)

    flat(LLSOA_RECORDS).to_parquet(base / "llsoa_regions.parquet", index=False)
    flat(GSP_RECORDS, ("GSPs", "GSPGroup")).to_parquet(base / "gsp_regions.parquet", index=False)
    for level in range(4):
        flat(nuts_records(level)).to_parquet(base / f"nuts_regions_l{level}.parquet", index=False)
        for year in (2016, 2021):
            flat(nuts_records(level, year)).to_parquet(
                base / f"nuts_regions_l{level}_{year}.parquet", index=False)

    # 20181031 GSP vintage: flat bbox table in BNG units (the oracle works
    # entirely in EPSG:27700 space) + the many:many lookup
    flat(GSP_20181031_RECORDS).to_parquet(
        base / "gsp_regions_20181031_bng.parquet", index=False)
    pd.DataFrame(GSP_LOOKUP_20181031,
                 columns=["region_id", "gsp_name", "gnode"]) \
        .to_parquet(base / "gsp_lookup_20181031.parquet", index=False)

    # DNO licence areas (neso.py:218-267): polygons + bbox columns (P6)
    dno_records = [
        {"region_id": "10", "Name": "UKPN East", "rings": _square(0.0, 51.5, 1.5, 53.0)},
        {"region_id": "12", "Name": "UKPN London", "rings": _square(-0.6, 51.2, 0.4, 51.8)},
    ]
    flat(dno_records, ("Name",)).to_parquet(base / "dno_regions.parquet", index=False)

    complex_recs = complex_region_records()
    flat_rows = []
    for seq, rec in enumerate(complex_recs):
        xs = [p[0] for p in rec["rings"][0]]
        ys = [p[1] for p in rec["rings"][0]]
        flat_rows.append({"region_id": rec["region_id"], "region_seq": seq,
                          "xmin": min(xs), "ymin": min(ys),
                          "xmax": max(xs), "ymax": max(ys)})
    pd.DataFrame(flat_rows).to_parquet(base / "complex_regions.parquet", index=False)
    # independent-transcription rasterization truth (res matches the
    # prepared 'complex' set so the cover map and this golden describe
    # the same grid)
    build_raster_golden(complex_recs, res=13) \
        .to_parquet(base / "raster_cells_golden.parquet", index=False)

    prep_dir = Path(prepared_dir) if prepared_dir else base / "prepared"
    # res 13 ~ production tuning: most covering cells interior (hash-probe
    # shortcut), boundary cells carry the exact 400-edge ray-cast
    save_prepared(prepare_regions(complex_recs, "complex", res=13), prep_dir)
    # res pinned: the auto pick moved 17 -> 16 when the 6th (Scottish OA)
    # region shifted the median extent, costing ~50% pipeline throughput
    # (fewer interior cells => more exact ray-casts). 17 keeps the
    # interior-cell shortcut rate of the 5-region vintage.
    save_prepared(prepare_regions(LLSOA_RECORDS, "llsoa", res=17), prep_dir)
    save_prepared(prepare_regions(dno_records, "dno", attrs_cols=["Name"]),
                  prep_dir)
    # versioned vintages exactly as the reference's mocked setup writes them
    # (Tests/test_geocode.py:79-80,143-146): same geometry per version
    for version in ["20220314", "20250109", "20251204", "20260209"]:
        save_prepared(prepare_regions(GSP_RECORDS, f"gsp_{version}",
                                      attrs_cols=["GSPs", "GSPGroup"]), prep_dir)
    for version in ["2011", "2021"]:
        save_prepared(prepare_regions(LLSOA_RECORDS, f"llsoa_{version}",
                                      res=17), prep_dir)
    save_prepared(prepare_regions(GSP_RECORDS, "gsp", attrs_cols=["GSPs", "GSPGroup"]),
                  prep_dir)
    # 20181031 vintage prepared from BNG source geometry (EPSG:27700 branch:
    # rings are normalized to WGS84 at prep, crs records the metre-unit source)
    save_prepared(prepare_regions(GSP_20181031_RECORDS, "gsp_20181031",
                                  crs="EPSG:27700"), prep_dir)
    for level in range(4):
        save_prepared(prepare_regions(nuts_records(level), f"nuts_l{level}"), prep_dir)
        for year in (2016, 2021):
            save_prepared(prepare_regions(nuts_records(level, year),
                                          f"nuts_l{level}_{year}"), prep_dir)


def checksum(base_dir: str | Path = FIXTURE_DIR) -> str:
    h = hashlib.sha256()
    for p in sorted(Path(base_dir).rglob("*.parquet")):
        h.update(p.read_bytes())
    return h.hexdigest()


if __name__ == "__main__":
    build_all()
    print("fixtures written to", FIXTURE_DIR, checksum())
