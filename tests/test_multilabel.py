"""Multi-label class-table IO (classes_io.py:60-169 semantics)."""

import os

import pytest

from rp_extract_spark.sources.multilabel import (
    multi_class_to_list,
    read_multi_class_file,
    read_multi_class_list,
    write_multi_class_list,
    write_multi_class_table,
)

HEADER = "filename\trock\tjazz\tpop"


def _write(tmp_path, lines, name="classes.tsv"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_replaces_pos_neg_and_blank(spark, tmp_path):
    path = _write(tmp_path, [HEADER, "a\tx\t\tx", "b\t\tx\t", "c\t\t\t"])
    df = read_multi_class_file(spark, path)
    rows = {r.id: (r.rock, r.jazz, r.pop) for r in df.collect()}
    assert rows == {"a": (1, 0, 1), "b": (0, 1, 0), "c": (0, 0, 0)}
    assert [f.dataType.simpleString() for f in df.schema.fields[1:]] == ["int"] * 3


def test_read_custom_pos_neg_labels(spark, tmp_path):
    path = _write(tmp_path, [HEADER, "a\tyes\tno\tyes", "b\tno\tyes\t"])
    df = read_multi_class_file(spark, path, pos_labels="yes", neg_labels="no")
    rows = {r.id: (r.rock, r.jazz, r.pop) for r in df.collect()}
    assert rows == {"a": (1, 0, 1), "b": (0, 1, 0)}


def test_read_unrecognized_entry_raises(spark, tmp_path):
    # classes_io.py:100-105: anything not pos/neg/blank is an error
    path = _write(tmp_path, [HEADER, "a\tx\t\tx", "b\t\tmaybe\t"])
    with pytest.raises(ValueError) as ei:
        read_multi_class_file(spark, path)
    msg = str(ei.value)
    assert "unrecognized" in msg and "jazz" in msg and "maybe" in msg and "b" in msg


def test_read_no_replace_returns_raw(spark, tmp_path):
    path = _write(tmp_path, [HEADER, "a\tweird\t\tx"])
    df = read_multi_class_file(spark, path, replace_labels=False)
    r = df.collect()[0]
    assert r.rock == "weird" and r.pop == "x"


def test_strip_filenames(spark, tmp_path):
    path = _write(tmp_path, [HEADER, "music/Sub/Track01.mp3\tx\t\t"])
    df = read_multi_class_file(spark, path, strip_filenames=True)
    assert df.collect()[0].id == "Track01"


def test_roundtrip_write_read(spark, tmp_path):
    src = _write(tmp_path, [HEADER, "a\tx\t\tx", "b\t\tx\t", "c\t\t\t"])
    df = read_multi_class_file(spark, src)
    out = str(tmp_path / "out")
    cats = write_multi_class_table(df, out)
    assert cats == ["rock", "jazz", "pop"]
    back = read_multi_class_file(spark, out)
    a = {r.id: (r.rock, r.jazz, r.pop) for r in df.collect()}
    b = {r.id: (r.rock, r.jazz, r.pop) for r in back.collect()}
    assert a == b


def test_to_list_and_list_roundtrip(spark, tmp_path):
    src = _write(tmp_path, [HEADER, "a\tx\t\tx", "b\t\tx\t", "c\t\t\t"])
    df = read_multi_class_file(spark, src)
    lst = multi_class_to_list(df)
    got = {r.id: r.classes for r in lst.collect()}
    # positive classes joined in column order (classes_io.py:137-147)
    assert got == {"a": "rock,pop", "b": "jazz", "c": ""}
    out = str(tmp_path / "lst")
    write_multi_class_list(lst, out)
    back = read_multi_class_list(spark, out)
    got2 = {r.id: list(r.classes) for r in back.collect()}
    assert got2 == {"a": ["rock", "pop"], "b": ["jazz"], "c": []}
