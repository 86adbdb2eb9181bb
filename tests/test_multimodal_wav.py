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
