"""Round-trip tests for the A3 pair file formats and the CLI (A16/A17)."""

from __future__ import annotations

from mrs_mapreduce_spark.fileformats import (
    read_bin,
    read_hex,
    write_bin,
    write_hex,
)

PAIRS = [
    (0, "plain string"),
    ("string-key", [1, 2, 3]),
    ((2, "tuple"), {"nested": {"dict": 1.5}}),
    (3, b"raw \x00 bytes"),
    (4, None),
]


def test_hex_roundtrip(spark, tmp_path):
    rdd = spark.sparkContext.parallelize(PAIRS, 2)
    out = str(tmp_path / "hexdata")
    write_hex(rdd, out)
    back = sorted(read_hex(spark, out).collect(), key=repr)
    assert back == sorted(PAIRS, key=repr)


def test_bin_roundtrip(spark, tmp_path):
    rdd = spark.sparkContext.parallelize(PAIRS, 3)
    out = str(tmp_path / "bindata")
    write_bin(rdd, out)
    back = sorted(read_bin(spark, out).collect(), key=repr)
    assert back == sorted(PAIRS, key=repr)


def test_cli_list_and_run(spark, capsys):
    from mrs_mapreduce_spark.cli import main

    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "groupby_agg" in out

    assert (
        main(
            [
                "--query",
                "groupby_agg",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--show",
                "3",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "l_returnflag" in out

    assert main(["--query", "no_such_query"]) == 2


def test_custom_pair_datasource(spark, tmp_path):
    """The hex format as a first-class Spark source (Python DataSource API)."""
    from mrs_mapreduce_spark.sources import pairsource

    rdd = spark.sparkContext.parallelize(PAIRS, 2)
    out = str(tmp_path / "pairsrc")
    write_hex(rdd, out)

    pairsource.register_source(spark)
    df = spark.read.format("mrs_pairs").load(out)
    assert df.columns == ["key_hex", "value_hex"]
    # source parallelism mirrors the file layout (one partition per file)
    assert df.rdd.getNumPartitions() == 2
    back = sorted(pairsource.decode_pairs(df).collect(), key=repr)
    assert back == sorted(PAIRS, key=repr)
