"""Media-probe gates: synthesized minimal-but-valid containers per the
public specs, plus the corrupt-input ValueError contract."""

import struct

import pytest

from lucene_ray.mediaprobe import (media_probe, probe_flac, probe_mp3,
                                   probe_mp4, probe_ogg)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), typ) + payload


def _mp4_bytes() -> bytes:
    mvhd = _box(b"mvhd", b"\x00" + b"\x00" * 3
                + b"\x00" * 8                      # ctime/mtime
                + struct.pack(">II", 1000, 5500)   # timescale, duration
                + b"\x00" * 80)
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 14)
    stsd = _box(b"stsd", b"\x00" * 8
                + _box(b"avc1", b"\x00" * 70))
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", mvhd + trak)
    return _box(b"ftyp", b"isom" + b"\x00" * 8) + moov


def test_mp4_probe():
    info = probe_mp4(_mp4_bytes())
    assert info["brand"] == "isom"
    assert info["timescale"] == 1000
    assert info["duration_s"] == 5.5
    assert info["streams"] == [{"type": "vide", "codec": "avc1"}]
    assert media_probe(_mp4_bytes())["format"] == "mp4"


def _flac_bytes(rate=44100, ch=2, bps=16, total=441000) -> bytes:
    bits = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    si = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def test_flac_probe():
    info = probe_flac(_flac_bytes())
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert info["bits_per_sample"] == 16
    assert info["duration_s"] == 10.0
    assert media_probe(_flac_bytes())["format"] == "flac"


def _mp3_bytes() -> bytes:
    # MPEG1 Layer3, 128 kbps (idx 9), 44100 (idx 0), stereo (mode 0)
    hdr = struct.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17)
                      | (1 << 16) | (9 << 12) | (0 << 10))
    frame = hdr + b"\x00" * 400
    return frame * 3


def test_mp3_probe():
    info = probe_mp3(_mp3_bytes())
    assert info["sample_rate"] == 44100
    assert info["bitrate"] == 128000
    assert info["channels"] == 2 and info["mpeg_version"] == 1
    assert info["duration_s"] > 0
    # with an ID3v2 tag in front
    tagged = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 \
        + _mp3_bytes()
    assert probe_mp3(tagged)["bitrate"] == 128000


def test_mp3_xing_frames():
    hdr = struct.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17)
                      | (1 << 16) | (9 << 12) | (0 << 10))
    body = bytearray(b"\x00" * 500)
    body[32:36] = b"Xing"                      # side info 32 (stereo)
    body[36:40] = struct.pack(">I", 1)         # flags: frames
    body[40:44] = struct.pack(">I", 38)        # 38 frames
    info = probe_mp3(hdr + bytes(body))
    assert info["frames"] == 38
    assert abs(info["duration_s"] - 38 * 1152 / 44100) < 1e-9


def _ogg_bytes() -> bytes:
    packet = b"\x01vorbis" + b"\x00" * 4 + bytes([2]) \
        + struct.pack("<I", 44100) + b"\x00" * 12
    seg = bytes([len(packet)])
    page0 = b"OggS" + b"\x00\x02" + struct.pack("<q", 0) \
        + b"\x00" * 12 + bytes([1]) + seg + packet
    page1 = b"OggS" + b"\x00\x04" + struct.pack("<q", 88200) \
        + b"\x00" * 12 + bytes([1]) + bytes([0])
    return page0 + page1


def test_ogg_probe():
    info = probe_ogg(_ogg_bytes())
    assert info["codec"] == "vorbis"
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert info["duration_s"] == 2.0


def test_corrupt_and_unknown_contracts():
    with pytest.raises(ValueError):
        media_probe(b"")
    with pytest.raises(NotImplementedError):
        media_probe(b"RIFFxxxxWEBP" + b"\x00" * 20)
    with pytest.raises(ValueError):
        probe_flac(b"fLaC\x80\x00\x00\x05short")
    with pytest.raises(ValueError):
        probe_mp4(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        probe_mp3(b"\x00" * 64)
    # box overrun
    bad = struct.pack(">I4s", 4096, b"ftyp") + b"\x00" * 8
    with pytest.raises(ValueError):
        probe_mp4(bad)


def test_states_bbox_reference_battery():
    """The reference's spatial-extras states battery
    (spatial-extras/src/test-files/states-Intersects-BBox.txt /
    states-IsWithin-BBox.txt over data/states-bbox.txt): real
    query→expected-ID pairs for the 2D box INTERSECTS / WITHIN
    relations (spatial4j ENVELOPE arg order minX, maxX, maxY, minY)
    — gates the box-relation predicates ft_box_range_field uses."""
    import re

    base = "/root/reference/lucene/spatial-extras/src/test-files"

    def envelope(s):
        m = re.search(r"ENVELOPE\(([^)]*)\)", s)
        a, b, c, d = [float(x) for x in m.group(1).split(",")]
        return (a, b, d, c)          # minX, maxX, minY, maxY

    states = {}
    for line in open(f"{base}/data/states-bbox.txt"):
        if line.startswith("#") or not line.strip():
            continue
        sid, _name, shape = line.rstrip("\n").split("\t")
        states[sid] = envelope(shape)

    def run(fname, rel):
        n = 0
        for line in open(f"{base}/{fname}"):
            if "@" not in line:
                continue
            expect_s, q = line.split("@")
            expect = set(expect_s.split())
            qx0, qx1, qy0, qy1 = envelope(q)
            got = set()
            for sid, (x0, x1, y0, y1) in states.items():
                if rel == "intersects":
                    ok = x0 <= qx1 and x1 >= qx0 \
                        and y0 <= qy1 and y1 >= qy0
                else:                # iswithin: doc box inside query
                    ok = x0 >= qx0 and x1 <= qx1 \
                        and y0 >= qy0 and y1 <= qy1
                if ok:
                    got.add(sid)
            assert got == expect, (fname, q.strip(), got, expect)
            n += 1
        assert n >= 3
    run("states-Intersects-BBox.txt", "intersects")
    run("states-IsWithin-BBox.txt", "iswithin")


def test_mapping_rules_file_parser():
    """MappingCharFilterFactory rules format, gated on the reference's
    ISOLatin1Accent partial mapping file."""
    import pytest as _pytest

    from lucene_ray.charfilter import (mapping_char_filter_from_file,
                                       parse_mapping_rules)

    path = ("/root/reference/lucene/benchmark/src/test/org/apache/"
            "lucene/benchmark/byTask/"
            "test-mapping-ISOLatin1Accent-partial.txt")
    f = mapping_char_filter_from_file(path)
    out, _m = f("café èlégant")
    assert out == "cafe elegant"
    rules = parse_mapping_rules(open(path, encoding="utf-8").read())
    assert rules["é"] == "e" and len(rules) >= 2
    with _pytest.raises(ValueError):
        parse_mapping_rules('"a" -> "b"')


def test_trec_parsers_on_reference_files():
    """TrecTopicsReader / TrecJudge input formats, gated on the
    reference's quality-benchmark files."""
    from lucene_ray.pipelines.fulltext import (parse_trec_qrels,
                                               parse_trec_topics)

    base = ("/root/reference/lucene/benchmark/src/test/org/apache/"
            "lucene/benchmark/quality/")
    topics = parse_trec_topics(open(base + "trecTopics.txt").read())
    assert len(topics) == 20
    assert topics[0]["qid"] == "0"
    assert topics[0]["title"] == "statement months  total 1987"
    assert topics[0]["description"].startswith("Topic 0 Description")
    assert topics[0]["narrative"].endswith("Line 2")
    qrels = parse_trec_qrels(open(base + "trecQRels.txt").read())
    assert qrels["0"]["fakedoc1"] == 1
    assert len(qrels) == 20 and sum(len(v) for v in qrels.values()) > 600


def test_line_docs_corpus(ray_session):
    """LineDocSource parsing gated on the reference's reuters
    first-20-lines file; the parsed corpus builds and searches."""
    from lucene_ray.corpus import line_docs_corpus

    path = ("/root/reference/lucene/benchmark/src/test/org/apache/"
            "lucene/benchmark/byTask/reuters.first20.lines.txt")
    ds = line_docs_corpus(path)
    t = ds.take_all()
    assert len(t) == 20
    bahia = next(r for r in t
                 if r["content"].startswith("BAHIA COCOA REVIEW"))
    assert "Showers continued" in bahia["content"]
    assert bahia["commit"] == "19870226200101"
    assert all(r["repo"] == "linedocs" for r in t)


def test_world_cities_point_in_bbox_battery():
    """The reference's cities-Intersects-BBox battery over
    world-cities-points.txt: point-in-envelope queries with real
    expected geoname IDs — gates the point/box intersection predicate
    the geo index uses."""
    import re

    base = "/root/reference/lucene/spatial-extras/src/test-files"
    pts = {}
    for line in open(f"{base}/data/world-cities-points.txt"):
        if line.startswith("#") or not line.strip():
            continue
        pid, _name, shape = line.rstrip("\n").split("\t")
        m = re.search(r"POINT\(([-0-9.]+) ([-0-9.]+)\)", shape)
        pts[pid] = (float(m.group(1)), float(m.group(2)))  # x=lon, y=lat
    n = 0
    for line in open(f"{base}/cities-Intersects-BBox.txt"):
        if "@" not in line:
            continue
        left, q = line.split("@")
        expect = set(t for t in left.split()
                     if t.startswith("G"))
        m = re.search(r"ENVELOPE\(([^)]*)\)", q)
        x0, x1, y1, y0 = [float(v) for v in m.group(1).split(",")]
        got = {pid for pid, (x, y) in pts.items()
               if x0 <= x <= x1 and y0 <= y <= y1}
        assert got == expect, (line.strip(), got, expect)
        n += 1
    assert n >= 3
