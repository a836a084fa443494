"""S5 xlsx source, S10 sqlite source, S11/R8 sinks (SURVEY §2.1, §2.8)."""

from __future__ import annotations

import os
import sqlite3
import zipfile

import pytest

from glamr_omics_pipelines_spark.sources import sinks, spreadsheets, sqlite as sq


def _make_xlsx(path: str) -> None:
    """Hand-rolled minimal SpreadsheetML workbook: two sheets, shared +
    inline strings, ints, floats, a blank cell, a bool."""
    ct = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
 <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""
    root_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="samples" sheetId="1" r:id="rId1"/>
  <sheet name="sequencing" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""
    wb_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    sst = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>SampleID</t></si><si><t>lat</t></si><si><t>samp_4589</t></si>
</sst>"""
    sheet1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
   <c r="C1" t="inlineStr"><is><t>flag</t></is></c></row>
  <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>45.25</v></c>
   <c r="C2" t="b"><v>1</v></c></row>
  <row r="3"><c r="A3" t="inlineStr"><is><t>samp_9</t></is></c>
   <c r="C3" t="b"><v>0</v></c></row>
 </sheetData>
</worksheet>"""
    sheet2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>n</t></is></c></row>
  <row r="2"><c r="A2"><v>7</v></c></row>
 </sheetData>
</worksheet>"""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet1)
        zf.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_read_xlsx_stdlib_parse(spark, tmp_path):
    p = str(tmp_path / "meta.xlsx")
    _make_xlsx(p)
    rows = spreadsheets.read_xlsx_rows(p, "samples")
    assert rows[0] == ["SampleID", "lat", "flag"]
    assert rows[1] == ["samp_4589", 45.25, True]
    assert rows[2] == ["samp_9", None, False]  # blank B3 padded


def test_read_xlsx_dataframe_and_sheet_select(spark, tmp_path):
    p = str(tmp_path / "meta.xlsx")
    _make_xlsx(p)
    df = spreadsheets.read_xlsx(spark, p, sheet="samples")
    assert df.columns == ["SampleID", "lat", "flag"]
    got = {r.SampleID: (r.lat, r.flag) for r in df.collect()}
    assert got["samp_4589"] == ("45.25", "True")
    assert got["samp_9"] == (None, "False")
    df2 = spreadsheets.read_xlsx(spark, p, sheet=1)
    assert df2.columns == ["n"] and df2.collect()[0].n == "7"
    with pytest.raises(KeyError):
        spreadsheets.read_xlsx(spark, p, sheet="nope")


def test_write_xlsx_roundtrip_cell_classes(tmp_path):
    """write_xlsx -> read_xlsx_rows is identity over every cell class the
    writer emits: escaped/whitespace-edged/unicode strings, bools, ints,
    floats, None (omitted cell)."""
    p = str(tmp_path / "rt.xlsx")
    rows = [["id", "lang", "n"],
            ["d<&>'\"1", " padded ", 42],
            [None, "é漢", 1.5],
            [True, "", -3],
            [False, "x", 0]]
    spreadsheets.write_xlsx(p, rows, sheet_name="docs & more")
    assert spreadsheets.read_xlsx_rows(p, "docs & more") == rows


def test_write_xlsx_reads_back_as_dataframe(spark, tmp_path):
    p = str(tmp_path / "rt2.xlsx")
    spreadsheets.write_xlsx(
        p, [["sample", "depth"], ["s1", 3], ["s2", 2.5]])
    df = spreadsheets.read_xlsx(spark, p)
    assert df.columns == ["sample", "depth"]
    got = {r.sample: r.depth for r in df.collect()}
    assert got == {"s1": "3", "s2": "2.5"}


def test_read_sqlite_types_and_missing(spark, tmp_path):
    db = str(tmp_path / "bakta.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE ups (hexdigest TEXT, length INTEGER, "
                    "gc REAL, uniref100_id TEXT)")
        con.executemany("INSERT INTO ups VALUES (?,?,?,?)",
                        [("ab12", 301, 0.51, "UniRef100_Q1"),
                         ("cd34", 77, None, None)])
    assert sq.list_tables(db) == ["ups"]
    df = sq.read_sqlite(spark, db, "ups")
    assert dict(df.dtypes) == {"hexdigest": "string", "length": "bigint",
                               "gc": "double", "uniref100_id": "string"}
    got = {r.hexdigest: r for r in df.collect()}
    assert got["ab12"].length == 301 and got["cd34"].gc is None
    with pytest.raises(KeyError):
        sq.read_sqlite(spark, db, "missing")


def test_write_tsv_headerless_single_file(spark, tmp_path):
    df = spark.createDataFrame([("c1", 3.5), ("c2", 1.25)], ["contig", "depth"])
    out = str(tmp_path / "depths")
    sinks.write_tsv(df, out, header=False, single_file=True)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    body = sorted(open(os.path.join(out, parts[0])).read().splitlines())
    assert body == ["c1\t3.5", "c2\t1.25"]


def test_export_matrix_column_slices_single_pass(spark, tmp_path):
    wide = spark.createDataFrame(
        [("c1", 1.0, 9.0), ("c2", 2.0, 8.0)], ["contig", "s1", "s2"])
    out = str(tmp_path / "maxbin")
    sinks.export_matrix_column_slices(wide, "contig", out)
    dirs = sinks.write_depths_manifest(out, str(tmp_path / "depths.txt"))
    assert dirs == ["sample=s1", "sample=s2"]
    s1 = []
    for root, _, files in os.walk(os.path.join(out, "sample=s1")):
        for f in files:
            if f.startswith("part-"):
                s1 += open(os.path.join(root, f)).read().splitlines()
    assert sorted(s1) == ["c1\t1.0", "c2\t2.0"]
    manifest = open(tmp_path / "depths.txt").read().splitlines()
    assert len(manifest) == 2 and manifest[0].endswith("sample=s1")


def test_orc_roundtrip_preserves_types(spark, tmp_path):
    """ORC is a first-class Spark format: engine tables round-trip through
    it with schema intact (the warehouse's parquet alternative)."""
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", 2.5, False)],
        "id long, name string, score double, flag boolean")
    path = str(tmp_path / "t.orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert sorted(r.id for r in back.collect()) == [1, 2]


def test_jsonlines_roundtrip(spark, tmp_path):
    """JSON-lines sink/source round-trip (the reference's JSON surface is
    read-side; the engine also writes it for interchange)."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    path = str(tmp_path / "t.jsonl")
    df.write.mode("overwrite").json(path)
    back = spark.read.json(path).select("id", "v")
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_read_sqlite_off_type_cell_degrades_to_null(spark, tmp_path):
    """SQLite is dynamically typed: a TEXT value in an INTEGER-declared
    column is legal and must degrade to NULL, not abort the whole copy
    with a createDataFrame TypeError."""
    db = str(tmp_path / "dirty.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE t (id INTEGER, score REAL)")
        con.executemany("INSERT INTO t VALUES (?,?)",
                        [(1, 0.5), ("N/A", "bad"), ("7", "2.5")])
    got = sorted(sq.read_sqlite(spark, db, "t").collect(),
                 key=lambda r: (r.id is None, r.id))
    assert (got[0].id, got[0].score) == (1, 0.5)
    assert (got[1].id, got[1].score) == (7, 2.5)   # convertible text converts
    assert got[2].id is None and got[2].score is None  # off-type -> null


def test_write_xlsx_quote_in_sheet_name_and_nonfinite_floats(tmp_path):
    """ADVICE r6: a '\"' in the sheet name must produce well-formed
    workbook.xml (quoteattr), and NaN/inf must not be written as numeric
    <v> cells (Excel/openpyxl reject them) — they round-trip as text."""
    p = str(tmp_path / "q.xlsx")
    rows = [["k", "v"], ["a", float("nan")], ["b", float("inf")],
            ["c", float("-inf")], ["d", 1.5]]
    spreadsheets.write_xlsx(p, rows, sheet_name='she"et <1>')
    back = spreadsheets.read_xlsx_rows(p, 'she"et <1>')
    assert back[0] == ["k", "v"] and back[4] == ["d", 1.5]
    assert back[1] == ["a", "nan"] and back[2] == ["b", "inf"]
    assert back[3] == ["c", "-inf"]
    # no numeric cell in the sheet XML carries a non-finite literal
    import zipfile
    with zipfile.ZipFile(p) as zf:
        xml = zf.read("xl/worksheets/sheet1.xml").decode()
    assert "<v>nan</v>" not in xml and "<v>inf</v>" not in xml


def test_read_sqlite_fractional_real_in_integer_column_nulls(spark, tmp_path):
    """ADVICE r6: a REAL 3.9 stored in an INTEGER-declared column must
    degrade to NULL (contract), not silently truncate to 3."""
    db = str(tmp_path / "frac.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE t (id INTEGER)")
        con.executemany("INSERT INTO t VALUES (?)", [(3.9,), (4.0,), (5,)])
    got = sorted((r.id for r in sq.read_sqlite(spark, db, "t").collect()),
                 key=lambda v: (v is None, v))
    assert got == [4, 5, None]
