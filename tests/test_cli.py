"""CLI parity: `python -m wordcount_spark <files...>` reproduces the
reference binaries' output format and semantics (in-process with the
shared session — a subprocess would pay a second JVM boot)."""

from __future__ import annotations

import pytest

from wordcount_spark.__main__ import main


@pytest.fixture()
def corpus(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text('The quick "quoted" fox... the END.\n')
    b.write_text("the lazy dog, the\n")
    return [str(a), str(b)]


def test_cli_stdout_format(spark, corpus, capsys):
    assert main(corpus, spark=spark) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == f"Filename: {corpus[0]}, total words: 10"
    # global aggregation across both files, sorted, 0-based rank
    assert out[1:] == [
        "[0] dog: 1",
        "[1] end: 1",
        "[2] fox: 1",
        "[3] lazy: 1",
        "[4] quick: 1",
        "[5] quoted: 1",
        "[6] the: 4",
    ]


def test_cli_file_sink_with_unique_line(spark, corpus, tmp_path, capsys):
    out_dir = str(tmp_path / "hybrid_out")
    assert main([*corpus, "--out", out_dir], spark=spark) == 0
    part = [
        line
        for line in spark.read.text(out_dir).orderBy("value").collect()
    ]
    text = "\n".join(r.value for r in part)
    assert f"Filename: {corpus[0]}" in text
    assert "Unique words found: 7" in text
    assert "[6] the: 4" in text


def test_cli_per_file_grouping(spark, corpus, capsys):
    assert main([*corpus, "--per-file"], spark=spark) == 0
    out = capsys.readouterr().out.splitlines()
    # per-source blocks: a.txt words precede b.txt words (sorted by source)
    a_name, b_name = "a.txt", "b.txt"
    joined = "\n".join(out)
    assert f"{a_name}/the: 2" in joined
    assert f"{b_name}/the: 2" in joined
