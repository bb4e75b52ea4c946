"""Codec-level tests for functions/media.py against HAND-CONSTRUCTED
bytes built directly from the public format specs (struct/zlib here, not
the module's own encoders) — the golden-bytes oracle for the real
multimodal decode layer. Round-trip and operator-integration tests
follow."""

import struct
import zlib

import numpy as np
import pytest

from geocode_spark.functions.media import (MediaFormatError, decode_bmp,
                                           decode_gif, decode_media_meta,
                                           decode_png, decode_wav,
                                           encode_bmp, encode_png,
                                           encode_wav, gif_header,
                                           media_features, parse_wav,
                                           png_ihdr, resize_image_payload,
                                           sniff, wav_frames)


def _bmp_header(w, h, bpp, body_len, off=54):
    return (b"BM" + struct.pack("<IHHI", off + body_len, 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, body_len,
                          0, 0, 0, 0))


def _png_chunk(typ, body):
    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def _png(w, h, depth, ctype, raw_scanlines, interlace=0, plte=None,
         trns=None):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    blob = sig + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        blob += _png_chunk(b"PLTE", plte)
    if trns is not None:
        blob += _png_chunk(b"tRNS", trns)
    return (blob + _png_chunk(b"IDAT", zlib.compress(raw_scanlines))
            + _png_chunk(b"IEND", b""))


# Adam7 pass layout, transcribed from the spec (independent of the
# engine's table) so interlaced fixtures are hand-built, not round-trips.
_ADAM7_SPEC = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _adam7_raw(img):
    """(h, w, ch) uint8 -> concatenated filter-0 pass scanlines."""
    out = b""
    for x0, y0, dx, dy in _ADAM7_SPEC:
        sub = img[y0::dy, x0::dx, :]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            out += b"\x00" + row.tobytes()
    return out


class TestBmpSpecBytes:
    def test_24bit_bottom_up_with_padding(self):
        # 2x2: top row red,green; bottom row blue,white. Stored bottom-up
        # in BGR, rows padded to 4 bytes (6 pixel bytes + 2 pad).
        rows_stored = (bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\0\0"  # image bottom row: blue, white
                       + bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\0\0")  # image top row: red, green
        blob = _bmp_header(2, 2, 24, len(rows_stored)) + rows_stored
        arr = decode_bmp(blob)
        expect = np.array([[[255, 0, 0], [0, 255, 0]],
                           [[0, 0, 255], [255, 255, 255]]], np.uint8)
        assert (arr == expect).all()

    def test_32bit_top_down_drops_alpha(self):
        # 1 wide, 2 tall, NEGATIVE height = top-down; BGRA stored
        body = bytes([10, 20, 30, 99]) + bytes([40, 50, 60, 99])
        blob = _bmp_header(1, -2, 32, len(body)) + body
        arr = decode_bmp(blob)
        assert (arr == np.array([[[30, 20, 10]], [[60, 50, 40]]],
                                np.uint8)).all()

    def test_rejects_compressed_and_truncated(self):
        body = b"\0" * 8
        blob = bytearray(_bmp_header(2, 1, 24, len(body)) + body)
        blob[30] = 1  # BI_RLE8
        with pytest.raises(MediaFormatError, match="BI_RGB"):
            decode_bmp(bytes(blob))
        with pytest.raises(MediaFormatError, match="truncated"):
            decode_bmp(_bmp_header(4, 4, 24, 64) + b"\0" * 10)


class TestPngSpecBytes:
    def test_grayscale_filters_none_sub_up(self):
        # 2x3 grayscale, one row per filter type 0/1/2
        raw = (b"\x00" + bytes([7, 9])            # None -> 7,9
               + b"\x01" + bytes([5, 6])          # Sub  -> 5, 11
               + b"\x02" + bytes([1, 2]))         # Up   -> 6, 13
        arr = decode_png(_png(2, 3, 8, 0, raw))
        assert arr.shape == (3, 2, 1)
        assert (arr[:, :, 0] == np.array([[7, 9], [5, 11], [6, 13]])).all()

    def test_rgb_average_and_paeth(self):
        # 2x2 RGB: row0 Average, row1 Paeth — expectations hand-computed
        # from the spec's reconstruction functions
        raw = (b"\x03" + bytes([10, 20, 30, 40, 50, 60])
               + b"\x04" + bytes([1, 2, 3, 4, 5, 6]))
        arr = decode_png(_png(2, 2, 8, 2, raw))
        assert (arr[0].ravel() == [10, 20, 30, 45, 60, 75]).all()
        assert (arr[1].ravel() == [11, 22, 33, 49, 65, 81]).all()

    def test_sub_filter_prefix_sum_rgb(self):
        raw = b"\x01" + bytes([5, 6, 7, 10, 10, 10])
        arr = decode_png(_png(2, 1, 8, 2, raw))
        assert (arr.ravel() == [5, 6, 7, 15, 16, 17]).all()

    def test_crc_mismatch_raises(self):
        blob = bytearray(_png(1, 1, 8, 0, b"\x00\x42"))
        blob[-5] ^= 0xFF  # corrupt IEND CRC
        with pytest.raises(MediaFormatError, match="CRC"):
            decode_png(bytes(blob))

    def test_rejects_illegal_depth_missing_plte_bad_interlace(self):
        with pytest.raises(MediaFormatError, match="PLTE"):
            decode_png(_png(1, 1, 8, 3, b"\x00\x00"))  # palette, no PLTE
        with pytest.raises(MediaFormatError, match="depth 16"):
            decode_png(_png(1, 1, 16, 3, b"\x00\x00\x00"))  # 16-bit palette
        with pytest.raises(MediaFormatError, match="depth 4"):
            decode_png(_png(1, 1, 4, 2, b"\x00\x00\x00"))  # sub-byte RGB
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)  # bad method
        blob = sig + _png_chunk(b"IHDR", ihdr)
        with pytest.raises(MediaFormatError, match="interlace"):
            png_ihdr(blob)

    def test_16bit_strips_to_high_byte(self):
        # 2x2 grayscale 16-bit: row0 filter 0 (pixels 0x1234, 0xFF01),
        # row1 Up (byte-wise deltas reconstruct 0x1334, 0x0001 -> but the
        # modulo-256 byte arithmetic is what the spec specifies)
        raw = (b"\x00" + bytes([0x12, 0x34, 0xFF, 0x01])
               + b"\x02" + bytes([0x01, 0x00, 0x01, 0xFF]))
        arr = decode_png(_png(2, 2, 16, 0, raw))
        assert arr.shape == (2, 2, 1)
        assert (arr[0].ravel() == [0x12, 0xFF]).all()
        # Up: 0x12+0x01=0x13, 0xFF+0x01=0x00 (mod 256) -> high bytes
        assert (arr[1].ravel() == [0x13, 0x00]).all()

    def test_16bit_rgb_sub_filter_uses_6_byte_distance(self):
        # 2x1 RGB 16-bit, Sub filter: the "prior byte" distance is
        # ch*2 = 6, so pixel 1's bytes add pixel 0's byte-for-byte
        p0 = bytes([0x10, 0xAA, 0x20, 0xBB, 0x30, 0xCC])
        d1 = bytes([0x05, 0x00, 0x06, 0x00, 0x07, 0x00])
        arr = decode_png(_png(2, 1, 16, 2, b"\x01" + p0 + d1))
        assert (arr[0, 0] == [0x10, 0x20, 0x30]).all()
        assert (arr[0, 1] == [0x15, 0x26, 0x37]).all()

    def test_palette_8bit_resolves_plte(self):
        # 2x2, 3-entry palette; indices laid down with Sub/None filters
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        raw = (b"\x00" + bytes([0, 1])
               + b"\x01" + bytes([2, 255]))  # Sub: 2, (2+255)&0xFF=1
        arr = decode_png(_png(2, 2, 8, 3, raw, plte=plte))
        assert arr.shape == (2, 2, 3)
        exp = np.array([[[255, 0, 0], [0, 255, 0]],
                        [[0, 0, 255], [0, 255, 0]]], np.uint8)
        assert (arr == exp).all()

    def test_palette_4bit_with_trns_alpha(self):
        # 3x1 depth-4 palette: 12 bits pack MSB-first into 2 bytes;
        # tRNS shorter than PLTE pads alpha=255 for the uncovered entry
        plte = bytes([10, 11, 12, 20, 21, 22, 30, 31, 32])
        raw = b"\x00" + bytes([0x01, 0x20])  # indices 0,1,2 + pad bits
        arr = decode_png(_png(3, 1, 4, 3, raw, plte=plte,
                              trns=bytes([128, 0])))
        assert arr.shape == (1, 3, 4)
        exp = np.array([[[10, 11, 12, 128], [20, 21, 22, 0],
                         [30, 31, 32, 255]]], np.uint8)
        assert (arr == exp).all()

    def test_palette_index_out_of_range_raises(self):
        plte = bytes([1, 2, 3])  # one entry; index 1 is out of range
        with pytest.raises(MediaFormatError, match="out of range"):
            decode_png(_png(1, 1, 8, 3, b"\x00\x01", plte=plte))

    def test_grayscale_subbyte_depths_scale_to_255(self):
        # depth 1, 2x1: bits 10 -> samples 1,0 -> 255,0
        arr = decode_png(_png(2, 1, 1, 0, b"\x00\x80"))
        assert (arr.ravel() == [255, 0]).all()
        # depth 2, 5x1: 10 bits MSB-first (values 3,0,1,2,3), x85 scale
        raw = b"\x00" + bytes([0b11000110, 0b11000000])
        arr = decode_png(_png(5, 1, 2, 0, raw))
        assert (arr.ravel() == [255, 0, 85, 170, 255]).all()
        # depth 4, 3x1: values 15, 0, 9 -> x17 scale
        raw = b"\x00" + bytes([0xF0, 0x90])
        arr = decode_png(_png(3, 1, 4, 0, raw))
        assert (arr.ravel() == [255, 0, 153]).all()

    def test_adam7_interlaced_rgb_roundtrips_pixels(self):
        # 5x3 RGB exercises empty passes (pass 3 has no rows, pass 7
        # covers row 1 only); raw pass data hand-built from the spec
        # table, filter 0 everywhere
        img = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
        blob = _png(5, 3, 8, 2, _adam7_raw(img), interlace=1)
        assert (decode_png(blob) == img).all()

    def test_adam7_interlaced_palette_subbyte(self):
        # 9x9 depth-1 palette, interlaced: every pass non-empty and the
        # sub-byte rows of each pass pad independently per scanline
        idx = ((np.arange(81).reshape(9, 9) % 2)).astype(np.uint8)
        plte = bytes([0, 0, 0, 255, 255, 255])
        raw = b""
        for x0, y0, dx, dy in _ADAM7_SPEC:
            sub = idx[y0::dy, x0::dx]
            for row in sub:
                packed = np.packbits(row)  # MSB-first, zero-padded
                raw += b"\x00" + packed.tobytes()
        blob = _png(9, 9, 1, 3, raw, interlace=1, plte=plte)
        arr = decode_png(blob)
        assert arr.shape == (9, 9, 3)
        assert (arr[:, :, 0] == idx * 255).all()
        assert (arr == arr[:, :, :1]).all()  # grey palette: channels agree

    def test_interlaced_meta_is_header_only(self):
        img = np.zeros((4, 4, 3), np.uint8)
        blob = _png(4, 4, 8, 2, _adam7_raw(img), interlace=1)
        assert png_ihdr(blob) == (4, 4, 8, 2)

    def test_multiple_idat_chunks_concatenate(self):
        raw = b"\x00" + bytes([1, 2]) + b"\x00" + bytes([3, 4])
        z = zlib.compress(raw)
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        blob = (sig + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", z[:5]) + _png_chunk(b"IDAT", z[5:])
                + _png_chunk(b"IEND", b""))
        assert (decode_png(blob)[:, :, 0] == [[1, 2], [3, 4]]).all()


def _gif(w, h, gct, lzw, mcs, interlace=False, gce=None, gct_bits=None,
         ix=0, iy=0, iw=None, ih=None, bg=0):
    """Hand-serialize a single-frame GIF89a (spec bytes, independent of
    any engine encoder). ``gct`` is raw RGB bytes, padded here to the
    2^bits entries the size field declares."""
    iw = w if iw is None else iw
    ih = h if ih is None else ih
    n = len(gct) // 3
    bits = max(1, (n - 1).bit_length()) if gct_bits is None else gct_bits
    pad = (1 << bits) * 3 - len(gct)
    blob = (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | (bits - 1), bg, 0]) + gct + b"\x00" * pad)
    if gce is not None:
        blob += b"\x21\xf9\x04" + bytes(gce) + b"\x00"
    blob += (b"\x2c" + struct.pack("<HHHH", ix, iy, iw, ih)
             + bytes([0x40 if interlace else 0]) + bytes([mcs]))
    for s in range(0, len(lzw), 255):
        chunk = lzw[s:s + 255]
        blob += bytes([len(chunk)]) + chunk
    return blob + b"\x00\x3b"


def _lzw_pack(codes_widths):
    """[(code, width), ...] -> LSB-first packed bytes per the GIF spec."""
    acc = nb = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nb
        nb += width
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        out.append(acc & 0xFF)
    return bytes(out)


def _uncompressed_codes(indices, mcs):
    """Emit every pixel as a root code, CLEARing often enough that the
    code width never grows — a legal 'uncompressed GIF' stream."""
    clear, width = 1 << mcs, mcs + 1
    codes = [(clear, width)]
    since = 0
    for v in indices:
        if since == clear - 2:
            codes.append((clear, width))
            since = 0
        codes.append((int(v), width))
        since += 1
    codes.append((clear + 1, width))  # EOI
    return codes


class TestGifSpecBytes:
    PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])

    def test_lzw_table_building_stream(self):
        # Hand-derived compressed stream for indices [1,1,1,1,1], mcs=2:
        # CLEAR, 1, then KwKwK code 6 ("11") twice; the second append
        # fills the 3-bit table so EOI is read at 4 bits
        lzw = _lzw_pack([(4, 3), (1, 3), (6, 3), (6, 3), (5, 4)])
        arr = decode_gif(_gif(5, 1, self.PAL4, lzw, 2))
        assert arr.shape == (1, 5, 3)
        assert (arr == np.array([0, 255, 0], np.uint8)).all()

    def test_uncompressed_stream_with_clear_resets(self):
        idx = np.arange(12, dtype=np.uint8) % 4
        lzw = _lzw_pack(_uncompressed_codes(idx, 2))
        arr = decode_gif(_gif(4, 3, self.PAL4, lzw, 2))
        pal = np.frombuffer(self.PAL4, np.uint8).reshape(4, 3)
        assert (arr == pal[idx.reshape(3, 4)]).all()

    def test_interlaced_rows_reorder(self):
        # 1x5 interlaced: row data arrives in pass order 0,4,2,1,3
        want = np.array([0, 1, 2, 3, 0], np.uint8)   # top-to-bottom
        arrival = want[[0, 4, 2, 1, 3]]
        lzw = _lzw_pack(_uncompressed_codes(arrival, 2))
        arr = decode_gif(_gif(1, 5, self.PAL4, lzw, 2, interlace=True))
        pal = np.frombuffer(self.PAL4, np.uint8).reshape(4, 3)
        assert (arr == pal[want][:, None, :]).all()

    def test_transparency_yields_alpha_channel(self):
        idx = np.array([0, 3, 1, 3], np.uint8)
        lzw = _lzw_pack(_uncompressed_codes(idx, 2))
        arr = decode_gif(_gif(4, 1, self.PAL4, lzw, 2,
                              gce=[0x01, 0, 0, 3]))  # index 3 transparent
        assert arr.shape == (1, 4, 4)
        assert (arr[0, :, 3] == [255, 0, 255, 0]).all()
        assert (arr[0, 1, :3] == [9, 9, 9]).all()  # RGB kept under alpha 0

    def test_subframe_composites_on_background(self):
        # 1x1 frame at (1,0) inside a 3x1 screen, background index 2
        lzw = _lzw_pack(_uncompressed_codes([1], 2))
        arr = decode_gif(_gif(3, 1, self.PAL4, lzw, 2, bg=2,
                              ix=1, iy=0, iw=1, ih=1))
        assert (arr[0, 0] == [0, 0, 255]).all()   # background
        assert (arr[0, 1] == [0, 255, 0]).all()   # the frame pixel
        assert (arr[0, 2] == [0, 0, 255]).all()

    def test_header_only_meta_and_sniff(self):
        lzw = _lzw_pack(_uncompressed_codes([0], 2))
        blob = _gif(7, 9, self.PAL4, lzw, 2)
        assert sniff(blob) == "gif"
        assert gif_header(blob) == (7, 9)
        meta = decode_media_meta(blob)
        assert (meta["media_type"], meta["width"], meta["height"]) == \
            ("image", 7, 9)

    def test_errors_truncated_and_out_of_range(self):
        # color index beyond the 4-entry table: mcs=3 roots reach 7
        lzw = _lzw_pack(_uncompressed_codes([5], 3))
        with pytest.raises(MediaFormatError, match="out of range"):
            decode_gif(_gif(1, 1, self.PAL4, lzw, 3, gct_bits=2))
        # stream too short for the declared frame
        lzw = _lzw_pack(_uncompressed_codes([1], 2))
        with pytest.raises(MediaFormatError, match="before frame is full"):
            decode_gif(_gif(2, 2, self.PAL4, lzw, 2))
        with pytest.raises(MediaFormatError, match="no image data"):
            decode_gif(b"GIF89a" + struct.pack("<HH", 1, 1)
                       + bytes([0, 0, 0]) + b"\x3b")


class TestWavSpecBytes:
    def _wav(self, channels=1, rate=8000, bits=16, n_samples=4000,
             extra_chunk=b""):
        block = channels * bits // 8
        body = bytes(n_samples * block)
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                          block, bits)
        chunks = (b"fmt " + struct.pack("<I", 16) + fmt + extra_chunk
                  + b"data" + struct.pack("<I", len(body)) + body)
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_duration_and_fmt(self):
        info = parse_wav(self._wav(channels=2, rate=16000, n_samples=8000))
        assert info["duration_ms"] == 500
        assert info["channels"] == 2 and info["sample_rate"] == 16000
        assert info["block_align"] == 4

    def test_chunk_walk_skips_odd_padded_chunks(self):
        # a LIST chunk of ODD length before data: walker must word-align
        extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        info = parse_wav(self._wav(extra_chunk=extra))
        assert info["duration_ms"] == 500

    def test_frames_are_block_aligned(self):
        blob = self._wav(channels=2, rate=8000, n_samples=1001)
        frames = wav_frames(blob, 4)
        assert len(frames) == 4
        assert sum(len(f) for f in frames) == 1001 * 4
        assert all(len(f) % 4 == 0 for f in frames)

    def test_rejects_non_pcm(self):
        blob = bytearray(self._wav())
        struct.pack_into("<H", blob, 20, 3)  # IEEE float
        with pytest.raises(MediaFormatError, match="PCM"):
            parse_wav(bytes(blob))


class TestRoundTrips:
    def test_bmp_round_trip(self):
        rng = np.random.default_rng(7)
        for w, h in [(1, 1), (3, 2), (5, 7), (8, 8)]:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_bmp(encode_bmp(arr)) == arr).all()

    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_png_round_trip(self, ch):
        rng = np.random.default_rng(ch)
        arr = rng.integers(0, 256, (5, 4, ch), dtype=np.uint8)
        out = decode_png(encode_png(arr))
        assert (out == arr).all()

    def test_wav_round_trip(self):
        rng = np.random.default_rng(3)
        pcm = rng.integers(-32768, 32767, (300, 2)).astype(np.int16)
        out, rate = decode_wav(encode_wav(pcm, 22050))
        assert rate == 22050 and (out == pcm).all()


class TestMetaAndFeatures:
    def test_meta_image_audio_binary(self):
        img = encode_png(np.zeros((6, 9, 3), np.uint8))
        m = decode_media_meta(img)
        assert (m["media_type"], m["width"], m["height"]) == ("image", 9, 6)
        assert m["duration_ms"] is None

        wav = encode_wav(np.zeros(8000, np.int16), 8000)
        m = decode_media_meta(wav)
        assert (m["media_type"], m["duration_ms"]) == ("audio", 1000)
        assert m["width"] is None

        m = decode_media_meta(b"plain old bytes")
        assert m["media_type"] == "binary" and m["n_bytes"] == 15

    def test_corrupt_media_downgrades_or_raises(self):
        img = bytearray(encode_png(np.zeros((2, 2), np.uint8)))
        img[-5] ^= 0xFF  # break a CRC
        assert decode_media_meta(bytes(img))["media_type"] == "image"
        # (IHDR still intact — header path succeeds; now break the header)
        bad = bytes(img[:20]) + b"junk"
        assert decode_media_meta(bad)["media_type"] == "binary"
        with pytest.raises(MediaFormatError):
            decode_media_meta(bad, strict=True)

    def test_features_use_decoded_content_not_bytes(self):
        # same pixels, different containers -> identical image features
        # (a byte-level histogram could never agree across BMP and PNG)
        rng = np.random.default_rng(11)
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        f_bmp = media_features(encode_bmp(arr), dim=8)
        f_png = media_features(encode_png(arr), dim=8)
        assert (f_bmp == f_png).all()
        assert abs(f_bmp.sum() - 1.0) < 1e-12

    def test_audio_features_histogram_pcm(self):
        # bins over [-32768, 32768): -32768->0, -1->1, 0->2, 32767->3
        pcm = np.array([-32768, -1, 0, 32767] * 25, dtype=np.int16)
        f = media_features(encode_wav(pcm, 8000), dim=4)
        assert (f == [0.25, 0.25, 0.25, 0.25]).all()

    def test_resize_nearest_neighbor(self):
        # 4x4 image with a distinct value per pixel; 2x2 nearest-neighbor
        # picks source rows/cols 0 and 2
        arr = (np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
               * np.ones(3, np.uint8))
        out = decode_bmp(resize_image_payload(encode_png(arr), 2, 2))
        assert (out[:, :, 0] == [[0, 2], [8, 10]]).all()

    def test_sniff(self):
        assert sniff(encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
        assert sniff(encode_png(np.zeros((2, 2), np.uint8))) == "png"
        assert sniff(encode_wav(np.zeros(4, np.int16), 8000)) == "wav"
        assert sniff(b"RIFF\x00\x00\x00\x00AVI ") == "avi"
        assert sniff(b"RIFF\x00\x00\x00\x00ACON") is None  # other RIFF
        assert sniff(b"") is None


class TestMalformedPayloadTaxonomy:
    """Review findings (round 4): low-level struct/zlib/index errors must
    surface as MediaFormatError so the operator layer's downgrade-vs-
    strict policy holds — one bad payload must never kill a Spark task
    with an uncaught exception type."""

    def test_truncated_wav_fmt_chunk_downgrades(self):
        wav = encode_wav(np.zeros(100, np.int16), 8000)
        for cut in (10, 13, 20, 30, 43):
            m = decode_media_meta(wav[:cut])
            assert m["media_type"] == "binary", f"cut={cut}"
        with pytest.raises(MediaFormatError):
            decode_media_meta(wav[:30], strict=True)

    def test_corrupt_deflate_png_features_fall_back(self):
        blob = bytearray(encode_png(np.full((8, 8), 7, np.uint8)))
        # find the IDAT payload and scramble it, then re-CRC the chunk so
        # only the deflate stream (not the chunk framing) is corrupt
        idx = bytes(blob).index(b"IDAT")
        ln = struct.unpack_from(">I", blob, idx - 4)[0]
        blob[idx + 4:idx + 4 + ln] = b"\x99" * ln
        crc = zlib.crc32(bytes(blob[idx:idx + 4 + ln])) & 0xFFFFFFFF
        struct.pack_into(">I", blob, idx + 4 + ln, crc)
        bad = bytes(blob)
        with pytest.raises(MediaFormatError):
            decode_png(bad)
        f = media_features(bad, dim=4)  # byte-histogram fallback, no crash
        assert abs(f.sum() - 1.0) < 1e-12

    def test_truncated_bmp_and_png_chunks(self):
        bmp = encode_bmp(np.zeros((4, 4, 3), np.uint8))
        for cut in (3, 20, 53, 60):
            with pytest.raises(MediaFormatError):
                decode_bmp(bmp[:cut])
        png = encode_png(np.zeros((4, 4), np.uint8))
        for cut in (9, 20, 40):
            with pytest.raises(MediaFormatError):
                decode_png(png[:cut])

    def test_png_decompression_bomb_rejected(self):
        from geocode_spark.functions.media import png_ihdr

        # declares 2x2 grayscale but the IDAT inflates to ~1 MB: must be
        # rejected WITHOUT materializing the whole stream
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        bomb = zlib.compress(b"\x00" * 1_000_000, 9)

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        blob = (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb)
                + chunk(b"IEND", b""))
        with pytest.raises(MediaFormatError, match="inflates|mismatch"):
            decode_png(blob)
        # declared-dims cap: a payload claiming absurd dimensions is
        # refused before any allocation
        huge = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 0, 0, 0, 0)
        blob2 = sig + chunk(b"IHDR", huge) + chunk(b"IDAT", b"x") \
            + chunk(b"IEND", b"")
        with pytest.raises(MediaFormatError, match="max_pixels"):
            decode_png(blob2)

    def test_bmp_header_only_matches_full_decode(self):
        from geocode_spark.functions.media import bmp_header

        rng = np.random.default_rng(5)
        for w, h in [(1, 1), (5, 3), (16, 9)]:
            blob = encode_bmp(rng.integers(0, 256, (h, w, 3), np.uint8))
            bw, bh, bpp, off, td = bmp_header(blob)
            arr = decode_bmp(blob)
            assert (bw, bh) == (arr.shape[1], arr.shape[0])
            assert bpp == 24 and td == 0


# --------------------------------------------------------------------------
# JPEG: hand-constructed baseline streams (struct-built, not encode_jpeg)
# --------------------------------------------------------------------------

def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc, th, bits, vals):
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


def _jpeg_gray_1block(qt, dht_body, entropy, w=8, h=8):
    """Minimal 1-component baseline JPEG: one DQT, SOF0, one DHT segment
    holding all tables, SOS, raw entropy bytes, EOI."""
    return (b"\xff\xd8"
            + _seg(0xDB, bytes([0x00]) + bytes(qt))
            + _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
                   + struct.pack(">BBB", 1, 0x11, 0))
            + _seg(0xC4, dht_body)
            + _seg(0xDA, bytes([1]) + struct.pack(">BB", 1, 0x00)
                   + bytes([0, 63, 0]))
            + entropy + b"\xff\xd9")


class TestJpegSpecBytes:
    def test_dc_only_flat_block(self):
        """DC coefficient 16 with flat qt=1: IDCT of a lone DC is the
        constant DC/8, so every pixel must be exactly 130."""
        from geocode_spark.functions.media import decode_jpeg, jpeg_header

        # DC table: single symbol 5 (category), code '0'; AC: single
        # symbol 0x00 (EOB), code '0'
        dht = _dht(0, 0, [1] + [0] * 15, [5]) + _dht(1, 0, [1] + [0] * 15, [0])
        # bits: DC code 0, magnitude 10000 (=16), EOB code 0 -> 0100000_1 pad
        entropy = bytes([0b01000001])
        data = _jpeg_gray_1block([1] * 64, dht, entropy)
        assert jpeg_header(data) == (8, 8, 1)
        out = decode_jpeg(data)
        assert out.shape == (8, 8, 1)
        assert np.all(out == 130)

    def test_single_ac_coefficient_against_independent_idct(self):
        """One AC coefficient (zigzag slot 1 = row-major (0,1), value 3,
        qt entry 8): expected pixels computed here with a straight
        transcription of the T.81 IDCT formula, independent of the
        decoder's einsum pipeline."""
        from geocode_spark.functions.media import decode_jpeg

        # DC: symbol 0 (zero diff), code '0'. AC: symbols [2, 0x00]:
        # canonical lengths 1,2 -> codes '0', '10'
        dht = _dht(0, 0, [1] + [0] * 15, [0]) + _dht(1, 0, [1, 1] + [0] * 14,
                                                     [2, 0x00])
        # DC '0'; AC sym2 '0' + magnitude '11' (=3); EOB '10' -> 001110_11
        entropy = bytes([0b00111011])
        data = _jpeg_gray_1block([8] * 64, dht, entropy)
        out = decode_jpeg(data)[:, :, 0]

        coef = np.zeros((8, 8))
        coef[0, 1] = 3 * 8  # dequantized

        def c(u):
            return 1 / np.sqrt(2) if u == 0 else 1.0

        exp = np.empty((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (c(u) * c(v) / 4 * coef[u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                exp[x, y] = s
        exp = np.clip(np.round(exp) + 128, 0, 255).astype(np.uint8)
        assert np.array_equal(out, exp)

    def test_entropy_unstuffing_and_restart_split(self):
        from geocode_spark.functions.media import _entropy_segments

        raw = b"\x12\xff\x00\x34\xff\xd0\x56\xff\xd9trailing"
        segs, end = _entropy_segments(raw, 0)
        assert segs == [b"\x12\xff\x34", b"\x56"]
        assert raw[end:end + 2] == b"\xff\xd9"  # resumes at the terminator

    @staticmethod
    def _bits(s):
        """'0101...' MSB-first -> bytes, 1-padded (T.81 scan padding)."""
        s = s + "1" * (-len(s) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))

    @staticmethod
    def _idct_expected(F, qtab):
        """Independent transcription of dequant + T.81 IDCT + level
        shift for one block (F zigzag-free, row-major)."""
        x = np.arange(8)
        C = np.where(x == 0, 1 / np.sqrt(2), 1.0)
        out = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                fv = F[u, v] * qtab[u, v]
                if fv:
                    out += (C[u] * C[v] / 4.0 * fv
                            * np.outer(np.cos((2 * x + 1) * u * np.pi / 16),
                                       np.cos((2 * x + 1) * v * np.pi / 16)))
        return np.clip(np.round(out) + 128, 0, 255).astype(np.uint8)

    def test_progressive_full_pipeline(self):
        """Hand-built SOF2 grayscale 16x8 (two blocks) exercising every
        progressive scan kind: DC first (Al=1), DC refine, AC first with
        an EOB run skipping block 1, AC refine adding a precision bit.
        Expected pixels computed by an inline IDCT transcription."""
        from geocode_spark.functions.media import decode_jpeg, jpeg_header

        # target coefficients (quantized, zigzag k / row-major (u,v)):
        #   block0: DC=-28, k=1 -> (0,1) = 5 ; block1: DC=-16, AC all 0
        dc_tab = _dht(0, 0, [0, 2] + [0] * 14, [3, 4])   # 00->cat3 01->cat4
        ac_tab = _dht(1, 0, [0, 3] + [0] * 14, [0x00, 0x02, 0x10])
        dqt = bytes([0x00, 8]) + bytes([1] * 63)         # DC step 8, AC 1
        # scan 1 — DC first, Al=1: sends -14 (cat4, bits 0001) then
        # diff 6 (cat3, bits 110): (-14<<1, (-14+6)<<1) = (-28, -16)
        s_dc1 = self._bits("01" + "0001" + "00" + "110")
        # scan 2 — DC refine, Al=0: both low bits are 0
        s_dc2 = self._bits("00")
        # scan 3 — AC first, Al=1: block0 codes (r=0,s=2) value 2 then
        # EOB(r=1)+0 extra -> eobrun=1 skips block1 entirely
        s_ac1 = self._bits("01" + "10" + "10" + "0")
        # scan 4 — AC refine, Al=0: block0 EOB then a correction bit 1
        # lifts 2<<1=4 to 5; block1 EOB with nothing to correct
        s_ac2 = self._bits("00" + "1" + "00")
        data = (b"\xff\xd8"
                + _seg(0xDB, dqt)
                + _seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1)
                       + struct.pack(">BBB", 1, 0x11, 0))
                + _seg(0xC4, dc_tab + ac_tab)
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + s_dc1
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + s_dc2
                + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + s_ac1
                + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + s_ac2
                + b"\xff\xd9")
        assert jpeg_header(data) == (16, 8, 1)
        out = decode_jpeg(data)[:, :, 0]
        qtab = np.ones((8, 8))
        qtab[0, 0] = 8
        F0 = np.zeros((8, 8))
        F0[0, 0], F0[0, 1] = -28, 5
        F1 = np.zeros((8, 8))
        F1[0, 0] = -16
        want = np.hstack([self._idct_expected(F0, qtab),
                          self._idct_expected(F1, qtab)])
        assert np.array_equal(out, want)

    def test_progressive_dc_only_scan_sequence(self):
        """A progressive file whose scans cover only Ss=0 (DC) still
        decodes — AC coefficients remain zero (flat blocks)."""
        from geocode_spark.functions.media import decode_jpeg

        dc_tab = _dht(0, 0, [0, 2] + [0] * 14, [3, 4])
        dqt = bytes([0x00, 8]) + bytes([1] * 63)
        s_dc = self._bits("01" + "0001" + "00" + "110")  # -14, then +6
        s_ref = self._bits("00")
        data = (b"\xff\xd8"
                + _seg(0xDB, dqt)
                + _seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1)
                       + struct.pack(">BBB", 1, 0x11, 0))
                + _seg(0xC4, dc_tab)
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + s_dc
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + s_ref
                + b"\xff\xd9")
        out = decode_jpeg(data)[:, :, 0]
        # flat blocks at 128 + round(-28*8/8) = 100 and 128-16 = 112
        assert (out[:, :8] == 100).all()
        assert (out[:, 8:] == 112).all()

    def test_rejections(self):
        from geocode_spark.functions.media import decode_jpeg

        with pytest.raises(MediaFormatError, match="SOI"):
            decode_jpeg(b"\x00\x01")
        # 12-bit precision
        dht = _dht(0, 0, [1] + [0] * 15, [0]) + _dht(1, 0, [1] + [0] * 15, [0])
        data = (b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
                + _seg(0xC0, struct.pack(">BHHB", 12, 8, 8, 1)
                       + struct.pack(">BBB", 1, 0x11, 0))
                + _seg(0xC4, dht)
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
                + bytes([0b01000001]) + b"\xff\xd9")
        with pytest.raises(MediaFormatError, match="precision"):
            decode_jpeg(data)
        # truncated entropy: declared 16x8 (two MCUs), bits for one
        dht2 = _dht(0, 0, [1] + [0] * 15, [5]) + _dht(1, 0, [1] + [0] * 15,
                                                      [0])
        data = (b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
                + _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1)
                       + struct.pack(">BBB", 1, 0x11, 0))
                + _seg(0xC4, dht2)
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
                + bytes([0b01000001]) + b"\xff\xd9")
        with pytest.raises(MediaFormatError):
            decode_jpeg(data)

    def test_declared_dims_guard(self):
        from geocode_spark.functions.media import decode_jpeg

        dht = _dht(0, 0, [1] + [0] * 15, [5]) + _dht(1, 0, [1] + [0] * 15, [0])
        data = (b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
                + _seg(0xC0, struct.pack(">BHHB", 8, 30000, 30000, 1)
                       + struct.pack(">BBB", 1, 0x11, 0))
                + _seg(0xC4, dht)
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
                + bytes([0b01000001]) + b"\xff\xd9")
        with pytest.raises(MediaFormatError, match="max_pixels"):
            decode_jpeg(data)


class TestJpegRoundTrips:
    def test_flat_tile_gray_exact(self):
        from geocode_spark.functions.media import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(11)
        for h, w in [(8, 8), (13, 21), (40, 33)]:
            tiles = rng.integers(0, 256, (-(-h // 8), -(-w // 8)),
                                 dtype=np.uint8)
            y = np.repeat(np.repeat(tiles, 8, 0), 8, 1)[:h, :w]
            out = decode_jpeg(encode_jpeg(y))
            assert np.array_equal(out[:, :, 0], y)

    def test_flat_tile_420_color_exact(self):
        from geocode_spark.functions.media import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(12)
        h, w = 33, 50
        ty = rng.integers(0, 256, (-(-h // 16), -(-w // 16)), dtype=np.uint8)
        y = np.repeat(np.repeat(ty, 16, 0), 16, 1)[:h, :w]
        ch2, cw2 = -(-h // 2), -(-w // 2)
        cb = np.repeat(np.repeat(
            rng.integers(0, 256, (-(-ch2 // 8), -(-cw2 // 8)),
                         dtype=np.uint8), 8, 0), 8, 1)[:ch2, :cw2]
        cr = np.repeat(np.repeat(
            rng.integers(0, 256, (-(-ch2 // 8), -(-cw2 // 8)),
                         dtype=np.uint8), 8, 0), 8, 1)[:ch2, :cw2]
        out = decode_jpeg(encode_jpeg(y, cb, cr, sampling=(2, 2)))
        ui, xi = np.arange(h) // 2, np.arange(w) // 2
        yf = y.astype(np.float64)
        cbf = cb[ui][:, xi].astype(np.float64) - 128.0
        crf = cr[ui][:, xi].astype(np.float64) - 128.0
        exp = np.clip(np.round(np.stack(
            [yf + 1.402 * crf, yf - 0.344136 * cbf - 0.714136 * crf,
             yf + 1.772 * cbf], axis=-1)), 0, 255).astype(np.uint8)
        assert np.array_equal(out, exp)

    def test_restart_interval_roundtrip(self):
        from geocode_spark.functions.media import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(13)
        tiles = rng.integers(0, 256, (4, 6), dtype=np.uint8)
        y = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
        data = encode_jpeg(y, restart_interval=3)
        assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
        assert np.array_equal(decode_jpeg(data)[:, :, 0], y)

    def test_lossy_general_image_close(self):
        """Arbitrary (non-flat) content: baseline JPEG at flat qt=8 is
        lossy but must stay close — the general-encoder sanity bound."""
        from geocode_spark.functions.media import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(14)
        y = rng.integers(0, 256, (24, 40), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(y))[:, :, 0]
        assert np.abs(out.astype(int) - y.astype(int)).max() < 48

    def test_meta_and_features_dispatch(self):
        from geocode_spark.functions.media import encode_jpeg

        y = np.full((16, 24), 77, np.uint8)
        data = encode_jpeg(y)
        assert sniff(data) == "jpeg"
        m = decode_media_meta(data)
        assert (m["media_type"], m["width"], m["height"]) == ("image", 24, 16)
        f = media_features(data)
        hist = np.zeros(16)
        hist[77 * 16 // 256] = 1.0  # all pixels in one luma bin
        assert np.array_equal(f, hist)
        resized = resize_image_payload(data, 8, 6)
        assert decode_bmp(resized).shape == (6, 8, 3)


# --------------------------------------------------------------------------
# AVI (RIFF/MJPEG container) — hand-built spec bytes
# --------------------------------------------------------------------------

def _riff_chunk(cid, body):
    return cid + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _avi(frames, w=16, h=8, uspf=40000, total=None, handler=b"MJPG",
         rec_group=False, junk=True):
    """Minimal spec AVI: RIFF(AVI ) LIST hdrl(avih, LIST strl(strh, strf))
    [JUNK] LIST movi(00dc...). Built inline from the msdn layout — no
    engine or fixture writer involved."""
    total = len(frames) if total is None else total
    avih = struct.pack("<10I", uspf, 0, 0, 0x10, total, 0, 1, 0, w, h) \
        + b"\x00" * 16
    strh = (b"vids" + handler
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, uspf, 1_000_000,
                          0, total, 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih)
                       + _riff_chunk(b"LIST", b"strl"
                                     + _riff_chunk(b"strh", strh)
                                     + _riff_chunk(b"strf", strf)))
    if rec_group:
        movi_body = _riff_chunk(
            b"LIST", b"rec " + b"".join(_riff_chunk(b"00dc", f)
                                        for f in frames))
    else:
        movi_body = b"".join(_riff_chunk(b"00dc", f) for f in frames)
    body = hdrl \
        + (_riff_chunk(b"JUNK", b"\x00" * 12) if junk else b"") \
        + _riff_chunk(b"LIST", b"movi" + movi_body)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


class TestAviSpecBytes:
    FRAMES = [b"\xff\xd8frame-zero\xff\xd9", b"\xff\xd8one!\xff\xd9",
              b"\xff\xd8frame-2-odd\xff\xd9x"[:17]]  # odd length: padding

    def test_header_walk_meta(self):
        from geocode_spark.functions.media import parse_avi

        info = parse_avi(_avi(self.FRAMES, w=320, h=240, uspf=33333,
                              total=90))
        assert (info["width"], info["height"]) == (320, 240)
        assert info["n_frames"] == 90
        assert info["duration_ms"] == 90 * 33333 // 1000
        assert info["handler"] == "MJPG"

    def test_frames_byte_exact_with_padding_and_junk(self):
        from geocode_spark.functions.media import avi_frames

        assert avi_frames(_avi(self.FRAMES), 8) == self.FRAMES

    def test_rec_grouped_frames(self):
        from geocode_spark.functions.media import avi_frames

        assert avi_frames(_avi(self.FRAMES, rec_group=True), 8) \
            == self.FRAMES

    def test_even_sampling_rule(self):
        from geocode_spark.functions.media import avi_frames

        frames = [bytes([i]) * 5 for i in range(10)]
        # 10 frames, n=4 -> floor(j*10/4) = 0, 2, 5, 7
        assert avi_frames(_avi(frames), 4) == [frames[i]
                                               for i in (0, 2, 5, 7)]

    def test_real_mjpeg_frames_decode(self):
        from geocode_spark.functions.media import (avi_frames, decode_jpeg,
                                                   encode_jpeg)

        rng = np.random.default_rng(5)
        tiles = [np.repeat(np.repeat(
            rng.integers(0, 256, (2, 3), dtype=np.uint8), 8, 0), 8, 1)
            for _ in range(3)]
        payload = _avi([encode_jpeg(t) for t in tiles], w=24, h=16)
        out = avi_frames(payload, 3)
        for t, f in zip(tiles, out):
            assert np.array_equal(decode_jpeg(f)[:, :, 0], t)

    def test_meta_dispatch_video(self):
        meta = decode_media_meta(_avi(self.FRAMES, w=12, h=7, uspf=100000))
        assert meta["media_type"] == "video"
        assert (meta["width"], meta["height"]) == (12, 7)
        assert meta["duration_ms"] == 3 * 100000 // 1000

    def test_errors(self):
        from geocode_spark.functions.media import avi_frames, parse_avi

        with pytest.raises(MediaFormatError, match="not a RIFF/AVI"):
            parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
        # movi list but no hdrl -> missing avih
        no_hdrl = (b"RIFF" + struct.pack("<I", 4 + 12) + b"AVI "
                   + _riff_chunk(b"LIST", b"movi"))
        with pytest.raises(MediaFormatError, match="avih"):
            parse_avi(no_hdrl)
        with pytest.raises(MediaFormatError, match="dimensions"):
            parse_avi(_avi(self.FRAMES, w=0, h=8))
        with pytest.raises(MediaFormatError, match="no video frame"):
            avi_frames(_avi([]), 4)
        with pytest.raises(ValueError, match=">= 1"):
            avi_frames(_avi(self.FRAMES), 0)

    def test_sniff(self):
        assert sniff(_avi(self.FRAMES)) == "avi"

    def test_n_guard_stays_plain_valueerror(self):
        # the guard must NOT be converted to MediaFormatError by
        # @_format_errors: the operator layer swallows MediaFormatError
        # (downgrade policy), which would mask the caller bug as a
        # silent byte-slice fallback
        from geocode_spark.functions.media import (avi_frames, mp3_frames,
                                                   wav_frames)
        for fn, payload in ((avi_frames, _avi(self.FRAMES)),
                            (mp3_frames, b"\xff\xfb\x92\x04" + b"\x00" * 300),
                            (wav_frames, b"RIFF\x00\x00\x00\x00WAVE")):
            with pytest.raises(ValueError) as ei:
                fn(payload, 0)
            assert not isinstance(ei.value, MediaFormatError), fn

    def test_second_stream_chunks_excluded(self):
        # interleaved audio ('auds' stream 0, '00wb' chunks) + video
        # ('vids' stream 1, '01dc' chunks): sampling must walk ONLY the
        # vids stream's timeline
        from geocode_spark.functions.media import avi_frames

        w, h, uspf, total = 16, 8, 40000, len(self.FRAMES)
        avih = struct.pack("<10I", uspf, 0, 0, 0x10, total, 0, 2, 0,
                           w, h) + b"\x00" * 16
        strh_a = (b"auds" + b"\x00" * 4
                  + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 44100, 0,
                                44100, 0, 0, 0) + struct.pack("<4H", 0, 0, 0, 0))
        strh_v = (b"vids" + b"MJPG"
                  + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, uspf, 1_000_000,
                                0, total, 0, 0, 0)
                  + struct.pack("<4H", 0, 0, w, h))
        strf_v = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                             w * h * 3, 0, 0, 0, 0)
        hdrl = _riff_chunk(
            b"LIST", b"hdrl" + _riff_chunk(b"avih", avih)
            + _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh_a)
                          + _riff_chunk(b"strf", b"\x00" * 16))
            + _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh_v)
                          + _riff_chunk(b"strf", strf_v)))
        movi = b""
        for f in self.FRAMES:
            movi += _riff_chunk(b"00wb", b"AUDIO-NOT-A-FRAME")
            movi += _riff_chunk(b"01dc", f)
        body = hdrl + _riff_chunk(b"LIST", b"movi" + movi)
        payload = (b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI "
                   + body)
        assert avi_frames(payload, 8) == self.FRAMES

    def test_headerless_movi_defaults_to_stream_zero(self):
        # truncated-capture shape: no hdrl at all, movi intact —
        # frame extraction still surfaces the stream-0 chunks
        from geocode_spark.functions.media import avi_frames

        movi = b"".join(_riff_chunk(b"00dc", f) for f in self.FRAMES)
        body = _riff_chunk(b"LIST", b"movi" + movi)
        payload = (b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI "
                   + body)
        assert avi_frames(payload, 8) == self.FRAMES


# --------------------------------------------------------------------------
# MP3 (MPEG Layer III frame-header walk) — hand-built spec bytes
# --------------------------------------------------------------------------

def _mp3_frame(sr_idx=0, br_idx=9, pad=0, version=3, stereo=False,
               fill=0xAA):
    """One Layer III frame from the ISO 11172-3 header fields, built
    inline: sync/version/layer byte, bitrate+samplerate+padding byte,
    mode byte, then filler to the spec frame length."""
    v1 = version == 3
    sr = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          0: (11025, 12000, 8000)}[version][sr_idx]
    kbps = ((0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320) if v1 else
            (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160))[br_idx]
    ln = (1152 if v1 else 576) // 8 * kbps * 1000 // sr + pad
    b2 = 0xE0 | (version << 3) | (1 << 1) | 1   # sync|ver|layer III|no-CRC
    b3 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
    b4 = 0x00 if stereo else 0xC0
    return bytes([0xFF, b2, b3, b4]) + bytes([fill]) * (ln - 4)


class TestMp3SpecBytes:
    def test_duration_and_meta(self):
        from geocode_spark.functions.media import parse_mp3

        frames = [_mp3_frame(sr_idx=0, br_idx=9, pad=i & 1, fill=i)
                  for i in range(20)]
        info = parse_mp3(b"".join(frames))
        assert info["n_frames"] == 20
        assert info["sample_rate"] == 44100
        assert info["kbps"] == 128
        assert info["duration_ms"] == 20 * 1152 * 1000 // 44100

    def test_mpeg2_tables(self):
        from geocode_spark.functions.media import parse_mp3

        info = parse_mp3(_mp3_frame(version=2, sr_idx=1, br_idx=4) * 8)
        assert info["sample_rate"] == 24000
        assert info["kbps"] == 32
        assert info["duration_ms"] == 8 * 576 * 1000 // 24000

    def test_id3v2_skip_and_id3v1_tail(self):
        from geocode_spark.functions.media import parse_mp3

        tag_body = b"T" * 100
        id3 = (b"ID3\x04\x00\x00"
               + bytes([0, 0, 100 >> 7, 100 & 0x7F]) + tag_body)
        stream = id3 + _mp3_frame() * 5 + b"TAG" + b"\x00" * 125
        assert parse_mp3(stream)["n_frames"] == 5

    def test_truncated_final_frame_dropped(self):
        from geocode_spark.functions.media import parse_mp3

        full = _mp3_frame() * 4
        assert parse_mp3(full + _mp3_frame()[:-10])["n_frames"] == 4

    def test_frames_byte_exact_and_sampled(self):
        from geocode_spark.functions.media import mp3_frames

        frames = [_mp3_frame(fill=i) for i in range(10)]
        blob = b"".join(frames)
        assert mp3_frames(blob, 10) == frames
        assert mp3_frames(blob, 4) == [frames[i] for i in (0, 2, 5, 7)]

    def test_meta_dispatch_audio(self):
        meta = decode_media_meta(_mp3_frame() * 3)
        assert meta["media_type"] == "audio"
        assert meta["duration_ms"] == 3 * 1152 * 1000 // 44100

    def test_errors_and_sniff(self):
        from geocode_spark.functions.media import parse_mp3

        with pytest.raises(MediaFormatError, match="no MPEG"):
            parse_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x00garbage")
        # free-format (bitrate idx 0) is not a recognizable frame
        free = bytes([0xFF, 0xFB, 0x00, 0xC0]) + b"\x00" * 100
        assert sniff(free) is None
        assert sniff(_mp3_frame()) == "mp3"
        assert sniff(b"ID3\x04\x00\x00\x00\x00\x00\x00") == "mp3"
        # a lone 0xFF prefix is not an MP3 claim
        assert sniff(b"\xff\x00\x00\x00rest") is None


# --------------------------------------------------------------------------
# Generative fuzz: mutations of valid payloads must decode correctly or
# raise MediaFormatError — never any other exception, hang, or OOM
# --------------------------------------------------------------------------

class TestMutationFuzz:
    def _seeds(self):
        from geocode_spark.functions.media import encode_jpeg

        rng = np.random.default_rng(99)
        img = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
        pcm = rng.integers(-3000, 3000, (800, 2)).astype(np.int16)
        gif = _gif(6, 4, TestGifSpecBytes.PAL4,
                   _lzw_pack(_uncompressed_codes(
                       rng.integers(0, 4, 24, dtype=np.uint8), 2)), 2)
        from geocode_spark.sources.fixtures import _jpeg_prog_blob
        tiles = rng.integers(0, 256, (2, 3), dtype=np.uint8)
        jpeg = encode_jpeg(np.repeat(np.repeat(tiles, 8, 0), 8, 1))
        return [encode_png(img), encode_bmp(img),
                encode_wav(pcm, 16000), gif, jpeg,
                _jpeg_prog_blob(np.repeat(np.repeat(tiles, 8, 0), 8, 1)),
                _avi([jpeg, jpeg], w=24, h=16),
                b"".join(_mp3_frame(fill=i) for i in range(6))]

    def test_mutations_never_escape_taxonomy(self):
        from geocode_spark.functions.media import (avi_frames, decode_image,
                                                   decode_wav, mp3_frames)

        rng = np.random.default_rng(7)
        seeds = self._seeds()
        n_raised = 0
        for seed in seeds:
            for _ in range(120):
                b = bytearray(seed)
                op = rng.integers(0, 3)
                if op == 0:  # truncate
                    b = b[:rng.integers(1, len(b) + 1)]
                elif op == 1:  # flip one byte
                    b[rng.integers(0, len(b))] = int(rng.integers(0, 256))
                else:  # splice a random window
                    i = int(rng.integers(0, len(b)))
                    j = int(rng.integers(i, min(i + 40, len(b)) + 1))
                    b[i:j] = bytes(rng.integers(0, 256, j - i, dtype=np.uint8))
                payload = bytes(b)
                # the strict decode paths: only MediaFormatError may escape
                for fn in (decode_image, decode_wav,
                           lambda p: avi_frames(p, 3),
                           lambda p: mp3_frames(p, 3),
                           lambda p: decode_media_meta(p, strict=True)):
                    try:
                        fn(payload)
                    except MediaFormatError:
                        n_raised += 1
                # the lenient paths must never raise at all
                decode_media_meta(payload)
                media_features(payload)
        assert n_raised > 100  # the fuzz actually exercised failures

    def test_nested_truncation_sweep(self):
        """Every prefix length of each seed: decode or MediaFormatError."""
        seeds = self._seeds()
        for seed in seeds:
            step = max(len(seed) // 64, 1)
            for cut in range(1, len(seed), step):
                try:
                    decode_media_meta(seed[:cut], strict=True)
                except MediaFormatError:
                    pass

    def test_fill_bytes_before_restart_marker(self):
        """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        marker, including RSTn inside entropy data (code-review round 5:
        the segmenter used to treat FF FF as scan termination)."""
        from geocode_spark.functions.media import (_entropy_segments,
                                                   decode_jpeg, encode_jpeg)

        assert _entropy_segments(b"\x12\xff\xff\xd0\x34\xff\xd9", 0)[0] == \
            [b"\x12", b"\x34"]
        rng = np.random.default_rng(21)
        tiles = rng.integers(0, 256, (2, 6), dtype=np.uint8)
        y = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
        data = encode_jpeg(y, restart_interval=3)
        for i in range(8):
            m = bytes([0xFF, 0xD0 + i])
            if m in data:
                data = data.replace(m, b"\xff" + m, 1)  # inject a fill byte
                break
        assert np.array_equal(decode_jpeg(data)[:, :, 0], y)

    def test_successive_approximation_rejected(self):
        from geocode_spark.functions.media import decode_jpeg

        dht = _dht(0, 0, [1] + [0] * 15, [5]) + _dht(1, 0, [1] + [0] * 15, [0])
        data = (b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
                + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1)
                       + struct.pack(">BBB", 1, 0x11, 0))
                + _seg(0xC4, dht)
                + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0x21]))  # Ah/Al != 0
                + bytes([0b01000001]) + b"\xff\xd9")
        with pytest.raises(MediaFormatError, match="baseline|spectral"):
            decode_jpeg(data)
