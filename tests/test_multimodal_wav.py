"""The WAV writer must be spec-compliant, proven by a third-party reader:
Python's stdlib `wave` module parses the JVM-built bytes and reports the
same format/sample counts as our own RIFF parser (operators/multimodal
.py::decode_wav).  Also pins the parser's conformance details: unknown
chunks are skipped, odd-size chunks honor the pad byte."""

from __future__ import annotations

import io
import struct
import wave

from mysql_cdc_redis_spark.operators import multimodal as mm
from mysql_cdc_redis_spark.sources import load_table


def test_stdlib_wave_reads_jvm_built_files(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    rows = mm.build_wav_pcm8(docs).select("doc_id", "wav", "text").collect()
    assert rows
    for r in rows:
        w = wave.open(io.BytesIO(bytes(r["wav"])))
        assert w.getframerate() == mm.WAV_SAMPLE_RATE
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        payload = r["text"].encode()
        assert w.getnframes() == len(payload)
        assert w.readframes(w.getnframes()) == payload


def _wav_bytes(samples: bytes, extra_chunk: bytes = b"") -> bytes:
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += extra_chunk
    chunks += b"data" + struct.pack("<I", len(samples)) + samples
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parser_skips_unknown_and_odd_chunks(spark):
    # a LIST chunk with an ODD size before data: a naive offset-table
    # reader misaligns; a conforming parser skips size + pad byte
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    blob = _wav_bytes(b"abc", extra_chunk=odd)
    df = spark.createDataFrame([(1, blob)], "doc_id long, wav binary")
    out = mm.decode_wav(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_samples"] == 3
    assert row["sum_sq_dev"] == sum((b - 128) ** 2 for b in b"abc")


def test_parser_rejects_malformed(spark):
    bad = [(1, b"RIFX" + b"\x00" * 40), (2, b"RIFF\x04\x00\x00\x00WAVE")]
    df = spark.createDataFrame(bad, "doc_id long, wav binary")
    assert mm.decode_wav(df).count() == 0


def test_bmp_parser_honors_pixel_offset(spark):
    """A BMP whose pixel array does NOT start at byte 54 (palette/v5
    headers put it elsewhere): the parser must follow the offset field;
    an offset-54 assumption reads the gap bytes as pixels."""
    import numpy as np  # noqa: F401

    width, height = 16, 1
    pixels = bytes(range(48))
    gap = b"\xff" * 10  # junk between headers and pixels
    px_off = 54 + len(gap)
    hdr = b"BM" + struct.pack("<IHHI", px_off + len(pixels), 0, 0, px_off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    blob = hdr + info + gap + pixels
    df = spark.createDataFrame([(1, blob)], "doc_id long, bmp binary")
    out = mm.decode_bmp(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["n_pixels"]) == (16, 1, 16)
    assert r["sum_b"] == sum(range(0, 48, 3))
    assert r["sum_g"] == sum(range(1, 48, 3))
    assert r["sum_r"] == sum(range(2, 48, 3))


def test_bmp_parser_rejects_unsupported(spark):
    # 8-bpp and RLE-compressed files must be rejected, not mis-decoded
    def mk(bpp, compression):
        hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, 16, 1, 1, bpp, compression, 0, 0, 0, 0, 0)
        return hdr + info + b"\x00" * 48

    df = spark.createDataFrame(
        [(1, mk(8, 0)), (2, mk(24, 1))], "doc_id long, bmp binary"
    )
    assert mm.decode_bmp(df).count() == 0


def test_avi_parser_handles_junk_chunks_and_00dc(spark):
    """Real muxers emit JUNK padding chunks and compressed '00dc' frame
    fourccs; the parser must skip the former and accept the latter."""
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<10I", 40000, 0, 0, 0, 2, 0, 1, 48, 4, 4) + b"\x00" * 16
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    f1, f2 = bytes([10] * 48), bytes([200] * 48)
    movi = chunk(
        b"LIST",
        b"movi"
        + chunk(b"JUNK", b"\xee" * 7)   # odd-size padding chunk, must skip
        + chunk(b"00db", f1)
        + chunk(b"00dc", f2),           # compressed fourcc, must accept
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", b"\x00" * 16)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([(1, blob)], "doc_id long, avi binary")
    out = mm.decode_avi(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["n_frames_declared"], r["n_frames"]) == (4, 4, 2, 2)
    assert r["luma_sum"] == 10 * 48 + 200 * 48
    assert r["n_cuts"] == 1  # |480 - 9600| > 384


def test_avi_writer_roundtrips_through_parser(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    out = mm.decode_avi(mm.build_avi_dib(docs)).collect()
    rows = {r["doc_id"]: r for r in out}
    src = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    for did, r in rows.items():
        n = len(src[did]) // 48
        assert r["n_frames"] == r["n_frames_declared"] == n
        assert r["luma_sum"] == sum(src[did][: n * 48])


def test_avi_writer_zero_frame_doc_ends_at_declared_size(spark):
    """A document under one frame (48 bytes) must yield a zero-frame AVI
    that ends EXACTLY at its declared RIFF size — the unguarded
    sequence(0, -1) fold used to append two bogus '00db' chunks of
    trailing garbage past the declared file end."""
    docs = spark.createDataFrame(
        [(1, "x" * 47), (2, ""), (3, "y" * 48)], "doc_id long, text string"
    )
    built = {r["doc_id"]: bytes(r["avi"]) for r in mm.build_avi_dib(docs).collect()}
    for did, blob in built.items():
        declared_end = 8 + struct.unpack("<I", blob[4:8])[0]
        assert len(blob) == declared_end, (
            f"doc {did}: {len(blob) - declared_end} bytes past declared RIFF end"
        )
    df = mm.build_avi_dib(docs)
    out = {r["doc_id"]: r for r in mm.decode_avi(df).collect()}
    assert out[1]["n_frames"] == out[1]["n_frames_declared"] == 0
    assert out[2]["n_frames"] == 0
    assert out[3]["n_frames"] == 1


def test_wav_parser_skips_truncated_fmt_chunk(spark):
    """A 'fmt ' chunk declaring 16 bytes with fewer present must reject
    the ROW (dead-letter philosophy), not raise struct.error inside
    mapInPandas and abort the job."""
    truncated = b"RIFF" + struct.pack("<I", 4 + 8 + 6) + b"WAVE" + (
        b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00\x40\x1f"  # 6 of 16 bytes
    )
    good = _wav_bytes(b"ok")
    df = spark.createDataFrame(
        [(1, truncated), (2, good)], "doc_id long, wav binary"
    )
    out = mm.decode_wav(df).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_avi_parser_skips_truncated_avih(spark):
    """An avih chunk declaring 56 bytes but truncated by the blob end
    must reject the row, not struct.error."""
    avih_partial = b"avih" + struct.pack("<I", 56) + b"\x00" * 10  # 10 of 56
    body = b"AVI " + (
        b"LIST" + struct.pack("<I", 4 + len(avih_partial)) + b"hdrl" + avih_partial
    )
    blob = b"RIFF" + struct.pack("<I", len(body) + 100) + body  # declared > present
    df = spark.createDataFrame([(1, blob)], "doc_id long, avi binary")
    assert mm.decode_avi(df).count() == 0
    assert mm.sample_avi_frames(df).count() == 0


def test_avi_parser_clamps_overdeclared_list_size(spark):
    """A LIST whose DECLARED size overruns the blob (RIFF size also
    over-declared, so the outer clamp doesn't save it) must reject the
    row — the nested chunk walk must not run past the buffer into
    struct.error."""
    avih_partial = b"avih" + struct.pack("<I", 56) + b"\x00" * 10  # 10 of 56
    body = b"AVI " + (
        b"LIST" + struct.pack("<I", 200) + b"hdrl" + avih_partial  # LIST size lies
    )
    blob = b"RIFF" + struct.pack("<I", len(body) + 400) + body
    assert mm.demux_avi(blob) is None
    df = spark.createDataFrame([(1, blob)], "doc_id long, avi binary")
    assert mm.decode_avi(df).count() == 0
    assert mm.sample_avi_frames(df).count() == 0


def test_avi_parser_rejects_short_declared_avih(spark):
    """An avih DECLARING fewer than 40 bytes must not parse: the
    40-byte slice would otherwise be padded from the NEXT chunk's bytes
    and yield a garbage-but-accepted header (bogus width/height)."""
    avih_short = b"avih" + struct.pack("<I", 8) + b"\x00" * 8  # declares 8 bytes
    junk = b"JUNK" + struct.pack("<I", 44) + b"\x01" * 44  # fills the 40-slice
    hdrl_body = b"hdrl" + avih_short + junk
    body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    assert mm.demux_avi(blob) is None
    df = spark.createDataFrame([(1, blob)], "doc_id long, avi binary")
    assert mm.decode_avi(df).count() == 0


def test_sampled_avi_remux_is_spec_valid(spark):
    """The re-muxed AVI must carry LIST('strl'){strh,strf} matching the
    avih's dwStreams=1 declaration — a spec-conforming reader walks the
    stream list, so dropping it makes the 'valid smaller AVI' invalid."""
    docs = spark.createDataFrame([(1, "z" * 48 * 5)], "doc_id long, text string")
    avi = mm.build_avi_dib(docs)
    out = mm.sample_avi_frames(avi, every_nth=2).collect()[0]
    assert out["kept_frames"] == 3 and out["out_is_valid_avi"]

    def walk(b, off, stop):
        while off + 8 <= stop:
            cid = b[off : off + 4]
            csz = struct.unpack("<I", b[off + 4 : off + 8])[0]
            yield cid, off + 8, csz
            off += 8 + csz + (csz & 1)

    def strl_frames_declared(b):
        """Return strh.dwLength from LIST('hdrl')/LIST('strl')/strh."""
        end = 8 + struct.unpack("<I", b[4:8])[0]
        for cid, boff, bsz in walk(b, 12, end):
            if cid == b"LIST" and b[boff : boff + 4] == b"hdrl":
                for cid2, boff2, bsz2 in walk(b, boff + 4, boff + bsz):
                    if cid2 == b"LIST" and b[boff2 : boff2 + 4] == b"strl":
                        for cid3, boff3, bsz3 in walk(b, boff2 + 4, boff2 + bsz2):
                            if cid3 == b"strh" and bsz3 == 56:
                                assert b[boff3 : boff3 + 4] == b"vids"
                                return struct.unpack("<I", b[boff3 + 32 : boff3 + 36])[0]
        return None

    blob = bytes(avi.collect()[0]["avi"])
    assert strl_frames_declared(blob) == 5  # writer half carries strl
    avih, frames = mm.demux_avi(blob)
    rebuilt = mm.remux_avi(avih, frames[::2])
    # the remuxed file re-demuxes identically AND its stream list exists
    # with the new frame count — the prior _mux dropped strl entirely
    r_avih, r_frames = mm.demux_avi(rebuilt)
    assert r_avih[4] == 3 and r_frames == frames[::2]
    assert strl_frames_declared(rebuilt) == 3
    # declared sizes are exact: file ends at the declared RIFF boundary
    assert len(rebuilt) == 8 + struct.unpack("<I", rebuilt[4:8])[0]


def test_avi_parser_skips_overdeclared_truncated_frame(spark):
    """Round-3 ADVICE: a '00db'/'00dc' frame chunk declaring more bytes
    than the blob holds must be SKIPPED (its truncated slice would
    otherwise feed partial luma/cut stats), exactly like the avih
    present-bytes rejection — while intact sibling frames still parse."""
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    avih = struct.pack("<10I", 40000, 0, 0, 0, 2, 0, 1, 48, 4, 4) + b"\x00" * 16
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    good = bytes([10] * 48)
    # frame declares 48 bytes but only 20 are present (blob truncated);
    # both the movi LIST size and the RIFF size over-declare accordingly
    lying = b"00db" + struct.pack("<I", 48) + b"\x55" * 20
    movi_body = b"movi" + chunk(b"00db", good) + lying
    movi = b"LIST" + struct.pack("<I", len(movi_body) + 36) + movi_body
    body = b"AVI " + hdrl + movi
    blob = b"RIFF" + struct.pack("<I", len(body) + 36) + body

    parsed = mm.demux_avi(blob)
    assert parsed is not None
    _avih, frames = parsed
    assert frames == [good], "truncated frame must be skipped, intact kept"

    df = spark.createDataFrame([(1, blob)], "doc_id long, avi binary")
    out = mm.decode_avi(df).collect()
    assert len(out) == 1
    assert out[0]["n_frames"] == 1
    assert out[0]["luma_sum"] == 10 * 48
