"""Subunit binary-stream parse goldens — mirrors the reference's
real-fixture parse (tests/testrepository.subunit -> 6 docs,
test_logsender.py:1254-1359) plus its skip rules
(logsender.py:431-440, 527-529, 535-537)."""

import datetime as dt

from pyspark.sql import functions as F

from ci_log_processing_spark.operators.subunit import (
    BROKEN_FILE,
    encode_packet,
    encode_stream,
    parse_subunit_stream,
)
from ci_log_processing_spark.operators.subunit import (
    test_durations as durations_op,  # alias: avoid pytest collection
)

EPOCH = dt.datetime(2024, 1, 1)


def _us(*, s=0, us=0):
    base = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    return base + s * 1_000_000 + us


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, f, bytearray(p)) for c, f, p in rows],
        "conv_id string, file_name string, payload binary",
    )


# 6-doc golden stream in the reference fixture's spirit: successes
# with real durations + setUpClass skips with start == end
GOLDEN = [
    ("tests.test_a.TestA.test_one", "success", _us(), _us(s=7, us=103220)),
    ("tests.test_a.TestA.test_two", "success", _us(), _us(s=7, us=1220)),
    ("setUpClass (tests.test_b.TestB)", "skip", _us(s=9), _us(s=9)),
    ("tests.test_b.TestB.test_three", "success", _us(s=10), _us(s=12)),
    ("tests.test_c.TestC.test_four", "fail", _us(s=20), _us(s=21, us=5)),
    ("setUpClass (tests.test_d.TestD)", "skip", _us(s=30), _us(s=30)),
]


def test_parse_golden_stream(spark):
    df = _df(spark, [("c1", "testrepository.subunit", encode_stream(GOLDEN))])
    rows = parse_subunit_stream(df)
    got = {r["test_name"]: r for r in rows.collect()}
    assert len(got) == 6
    for name, status, s_us, e_us in GOLDEN:
        r = got[name]
        assert r["test_status"] == status
        assert int(r["start_ts"].timestamp() * 1_000_000) == s_us
    durs = {
        r["test_name"]: r["test_duration"]
        for r in durations_op(rows).collect()
    }
    # the reference's duration quirk: micros concatenated after a dot
    assert durs["tests.test_a.TestA.test_one"] == 7.103220
    assert durs["tests.test_a.TestA.test_two"] == 7.1220  # == 7.122!
    assert durs["setUpClass (tests.test_b.TestB)"] == 0.0
    assert durs["tests.test_c.TestC.test_four"] == 1.5


def test_broken_file_name_skipped(spark):
    # P8 (logsender.py:527-529): content is VALID — skip is by name
    df = _df(spark, [("c1", BROKEN_FILE, encode_stream(GOLDEN[:2]))])
    assert parse_subunit_stream(df).count() == 0


def test_non_subunit_content_skipped(spark):
    # "Non subunit content. Skipping..." (logsender.py:431-440)
    df = _df(
        spark,
        [
            ("c1", "x.subunit", b"this is just a text file"),
            ("c2", "y.subunit", b""),  # P9 empty-file skip
            ("c3", "z.subunit", encode_stream(GOLDEN[:1])),
        ],
    )
    out = parse_subunit_stream(df).collect()
    assert [r["conv_id"] for r in out] == ["c3"]


def test_midstream_corruption_truncates(spark):
    good = encode_stream(GOLDEN[:3])
    payload = good + b"\xff\x00garbage" + encode_packet(*GOLDEN[3])
    df = _df(spark, [("c1", "x.subunit", payload)])
    out = parse_subunit_stream(df).collect()
    # stops at the last good packet before the corruption
    assert sorted(r["test_name"] for r in out) == sorted(
        n for n, *_ in GOLDEN[:3]
    )


def test_multibyte_test_name_roundtrip(spark):
    # name_len is UTF-8 BYTES: a multi-byte char must not desync the
    # stream (Catalyst encoder uses octet_length, not length)
    from ci_log_processing_spark.operators.subunit import packet_hex_col
    from pyspark.sql import functions as F

    tests = [
        ("tests.test_ü.TestÜ.test_ünïcode", "success", _us(), _us(s=1)),
        ("tests.test_after.TestA.test_two", "success", _us(), _us(s=2)),
    ]
    # python encoder roundtrip
    df = _df(spark, [("c1", "x.subunit", encode_stream(tests))])
    names = sorted(r["test_name"] for r in parse_subunit_stream(df).collect())
    assert names == sorted(n for n, *_ in tests)
    # catalyst encoder produces byte-identical framing
    rows = spark.createDataFrame(
        tests,
        "test_name string, test_status string, start_us long, end_us long",
    )
    hexes = {
        r["test_name"]: r["h"]
        for r in rows.select(
            "test_name",
            packet_hex_col(
                F.col("test_name"), F.col("test_status"),
                F.col("start_us"), F.col("end_us"),
            ).alias("h"),
        ).collect()
    }
    for t in tests:
        assert bytes.fromhex(hexes[t[0]]) == encode_packet(*t)


def test_roundtrip_catalyst_encoder(spark):
    # packet_hex_col must produce byte-identical framing to
    # encode_packet for the same fields
    from ci_log_processing_spark.operators.subunit import packet_hex_col

    rows = spark.createDataFrame(
        [(n, s, a, b) for n, s, a, b in GOLDEN],
        "test_name string, test_status string, start_us long, end_us long",
    )
    hexes = rows.select(
        packet_hex_col(
            F.col("test_name"),
            F.col("test_status"),
            F.col("start_us"),
            F.col("end_us"),
        ).alias("h"),
        "test_name",
    ).collect()
    by_name = {r["test_name"]: r["h"] for r in hexes}
    for t in GOLDEN:
        assert bytes.fromhex(by_name[t[0]]) == encode_packet(*t)
