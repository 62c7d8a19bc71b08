"""decode_media_meta: real header parsing, including the garbage path a
100 TB crawl always hits (corrupt payloads degrade, never fail the batch).
"""

from __future__ import annotations

import struct
import zlib

from amazon_sales_data_engineering_spark.multimodal.binary_ops import (
    decode_media_meta,
)


def _png(width: int, height: int, color_type: int = 6) -> bytes:
    body = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + body
        + struct.pack(">I", crc)
    )


def _wav(nch: int, rate: int, frames: int) -> bytes:
    block = nch * 2
    size = frames * block
    return (
        b"RIFF" + struct.pack("<I", 36 + size) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, nch, rate, rate * block, block, 16)
        + b"data" + struct.pack("<I", size) + b"\x00" * size
    )


def test_decode_media_meta_parses_and_degrades(spark):
    bad_crc = bytearray(_png(10, 10))
    bad_crc[-1] ^= 0xFF  # corrupt the IHDR CRC
    rows = [
        (1, _png(640, 480)),             # RGBA png
        (2, _png(32, 16, color_type=2)), # RGB png -> 3 channels
        (3, _wav(2, 16000, 8000)),       # 500 ms stereo wav
        (4, b"\x89PNG\r\n\x1a\nxx"),     # truncated png
        (5, bytes(bad_crc)),             # CRC mismatch
        (6, b"plain text, not media"),   # garbage
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.asDict() for r in decode_media_meta(df, "doc_id", "payload").collect()}

    assert (got[1]["format"], got[1]["width"], got[1]["height"], got[1]["channels"]) == ("png", 640, 480, 4)
    assert (got[2]["format"], got[2]["channels"]) == ("png", 3)
    assert (got[3]["format"], got[3]["channels"], got[3]["sample_rate"], got[3]["duration_ms"]) == ("wav", 2, 16000, 500)
    for bad in (4, 5, 6):
        assert got[bad]["format"] == "unknown" and got[bad]["valid"] is False
    assert all(got[i]["valid"] is True for i in (1, 2, 3))


def test_extract_binary_meta_sniffs_real_signatures(spark):
    """extract_binary_meta's magic-byte sniff (the triage stage before
    per-format decoders) on spec-valid PNG/WAV bytes, garbage, and the
    empty payload — the positive path the text-payload oracle query
    can't reach."""
    from amazon_sales_data_engineering_spark.multimodal.binary_ops import (
        extract_binary_meta,
    )

    rows = [
        (1, _png(32, 16)),
        (2, _wav(2, 8000, 100)),
        (3, b"not a container"),
        (4, b""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r.doc_id: (r.n_bytes, r.first_byte, r.sniffed_format)
        for r in extract_binary_meta(df, "doc_id", "payload").collect()
    }
    assert got[1] == (len(rows[0][1]), 0x89, "png")
    assert got[2] == (len(rows[1][1]), ord("R"), "wav")
    assert got[3] == (15, ord("n"), "other")
    assert got[4] == (0, -1, "empty")


def test_scrub_removes_ancillary_and_revalidates(spark):
    from amazon_sales_data_engineering_spark.multimodal.binary_ops import (
        scrub_metadata_chunks,
        synthesize_media_with_metadata,
    )

    ids = spark.createDataFrame([(0,), (1,), (2,), (7,)], "doc_id bigint")
    payloads = synthesize_media_with_metadata(ids, "doc_id")
    rows = {
        r.doc_id: r
        for r in scrub_metadata_chunks(payloads, "doc_id", "payload").collect()
    }
    # even -> png with 2 tEXt chunks removed; odd -> wav with 1 LIST
    assert rows[0].format == "png" and rows[0].n_removed == 2
    assert rows[1].format == "wav" and rows[1].n_removed == 1
    assert all(r.valid_after for r in rows.values())
    assert all(r.bytes_after < r.bytes_before for r in rows.values())
    # the GPS text is genuinely gone from the payload bytes
    raw = {r.doc_id: bytes(r.payload) for r in payloads.collect()}
    assert b"lat=" in raw[0] and b"artist-" in raw[1]


def test_scrub_is_idempotent_and_safe_on_garbage(spark):
    from amazon_sales_data_engineering_spark.multimodal.binary_ops import (
        scrub_metadata_chunks,
        synthesize_media_with_metadata,
    )

    ids = spark.createDataFrame([(4,), (5,)], "doc_id bigint")
    first = scrub_metadata_chunks(
        synthesize_media_with_metadata(ids, "doc_id"),
        "doc_id",
        "payload",
        emit_payload=True,
    )
    # idempotence: a second pass over the scrubbed payloads removes
    # nothing and changes no bytes
    second = scrub_metadata_chunks(
        first.select("doc_id", "payload"), "doc_id", "payload"
    ).collect()
    assert all(r.n_removed == 0 for r in second)
    assert all(r.bytes_after == r.bytes_before for r in second)
    assert all(r.valid_after for r in second)
    first = first.collect()

    # garbage passes through unchanged, flagged invalid
    garbage = spark.createDataFrame(
        [(9, bytearray(b"not a media file"))], "doc_id bigint, payload binary"
    )
    g = scrub_metadata_chunks(garbage, "doc_id", "payload").collect()[0]
    assert g.format == "unknown" and g.n_removed == 0
    assert g.bytes_before == g.bytes_after == 16
    assert g.valid_after is False
    assert {r.format for r in first} == {"png", "wav"}


def test_scrub_policy_keeps_rendering_chunks_drops_metadata(spark):
    """Round-10 policy refinement: the scrubber is selective, not
    drop-everything — PNG rendering-relevant ancillary chunks (tRNS,
    gAMA) and WAV adtl cue-label LISTs survive, while tEXt, INFO LISTs
    and standalone id3 chunks are removed."""
    import struct
    import zlib

    from amazon_sales_data_engineering_spark.multimodal.binary_ops import (
        scrub_metadata_chunks,
    )

    def png_chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", 16, 16, 8, 6, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + png_chunk(b"IHDR", ihdr)
        + png_chunk(b"gAMA", struct.pack(">I", 45455))
        + png_chunk(b"tRNS", b"\x00\x01")
        + png_chunk(b"tEXt", b"Author\x00someone")
        + png_chunk(b"prVt", b"smuggled")  # unknown private ancillary
        + png_chunk(b"IEND", b"")
    )

    def riff_chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    fmt = riff_chunk(
        b"fmt ", struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    )
    adtl = riff_chunk(b"LIST", b"adtl" + riff_chunk(b"labl", b"\x01\x00\x00\x00cue"))
    info = riff_chunk(b"LIST", b"INFO" + riff_chunk(b"IART", b"artist-x"))
    id3 = riff_chunk(b"id3 ", b"ID3\x03\x00tagbytes")
    data = riff_chunk(b"data", b"\x00" * 20)
    body = fmt + adtl + info + id3 + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav))],
        "doc_id bigint, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in scrub_metadata_chunks(
            df, "doc_id", "payload", emit_payload=True
        ).collect()
    }
    # png: tEXt + unknown private dropped; gAMA/tRNS kept
    p = rows[1]
    assert p.n_removed == 2 and p.valid_after
    out = bytes(p.payload)
    assert b"gAMA" in out and b"tRNS" in out
    assert b"tEXt" not in out and b"prVt" not in out
    # wav: INFO LIST + id3 dropped; adtl LIST kept; RIFF size rewritten
    w = rows[2]
    assert w.n_removed == 2 and w.valid_after
    out = bytes(w.payload)
    assert b"adtl" in out and b"labl" in out
    assert b"INFO" not in out and b"id3 " not in out
    (stated,) = struct.unpack("<I", out[4:8])
    assert stated == len(out) - 8


def test_valid_after_rejects_overrunning_final_chunk(spark):
    """Round-9 ADVICE: valid_wav must reject a payload whose final chunk
    size overruns the buffer, and require the walk to land exactly at
    end-of-buffer. An overrunning input can't be scrubbed either, so it
    passes through as-is — valid_after must come back False, not True."""
    import struct

    from amazon_sales_data_engineering_spark.multimodal.binary_ops import (
        scrub_metadata_chunks,
    )

    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16
    )
    # data chunk claims 100 bytes but carries 4
    bad_data = b"data" + struct.pack("<I", 100) + b"\x00" * 4
    body = fmt + bad_data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # trailing partial header: walk cannot land exactly at end-of-buffer
    body2 = fmt + b"data" + struct.pack("<I", 4) + b"\x00" * 4 + b"XYZ"
    wav2 = b"RIFF" + struct.pack("<I", 4 + len(body2)) + b"WAVE" + body2

    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(wav2))],
        "doc_id bigint, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in scrub_metadata_chunks(df, "doc_id", "payload").collect()
    }
    assert rows[1].valid_after is False and rows[1].n_removed == 0
    assert rows[2].valid_after is False and rows[2].n_removed == 0


def test_undersized_list_chunk_not_misread_as_info(spark):
    """Round-10 review: the LIST form-type read requires the LIST's own
    size >= 4 — an undersized LIST followed by bytes spelling 'INFO'
    (the next chunk's id) must NOT be classified as an INFO list."""
    import struct

    from amazon_sales_data_engineering_spark.multimodal.binary_ops import (
        scrub_metadata_chunks,
    )

    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16
    )
    # zero-size LIST immediately followed by a chunk whose ID is 'INFO'
    empty_list = b"LIST" + struct.pack("<I", 0)
    info_named = b"INFO" + struct.pack("<I", 4) + b"abcd"
    data = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    body = fmt + empty_list + info_named + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id bigint, payload binary")
    r = scrub_metadata_chunks(df, "doc_id", "payload", emit_payload=True).collect()[0]
    # nothing dropped: the empty LIST isn't INFO-form, and 'INFO' here is
    # a chunk ID, not a form type
    assert r.n_removed == 0
    assert bytes(r.payload) == wav
