"""Spreadsheet sources (SURVEY §2.1 S5).

The reference loads sample metadata from Excel workbooks and Google Sheets
(`code/check_import_status.R:17-22` — ``readxl::read_excel(..., sheet =
"samples" / "sequencing")``; `code/update_output_status.R:6-11` —
``googlesheets4::read_sheet``). These are *driver-side, small-table* sources:
a few thousand metadata rows that seed the warehouse star, never a scan path
for bulk data. We mirror that: parse on the driver, hand Spark a DataFrame,
and let every downstream join broadcast it.

No third-party Excel library is assumed. ``.xlsx`` is a ZIP of
SpreadsheetML XML, so the stdlib (``zipfile`` + ``xml.etree``) reads it
deterministically; if pandas+openpyxl happen to be importable we defer to
them for fuller fidelity (dates, formula caches).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_NS}si"):
        # concatenate all text runs (plain <t> or rich-text <r><t>)
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_member(zf: zipfile.ZipFile, sheet: str | int | None) -> str:
    """Resolve a sheet name/index to its zip member via workbook rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {r.get("Id"): r.get("Target")
                  for r in rels.iter() if r.get("Id")}
    sheets = []  # (name, member)
    for sh in wb.iter(f"{_NS}sheet"):
        target = rel_target[sh.get(f"{_REL_NS}id")]
        member = target if target.startswith("xl/") else f"xl/{target}"
        sheets.append((sh.get("name"), member))
    if sheet is None:
        return sheets[0][1]
    if isinstance(sheet, int):
        return sheets[sheet][1]
    for name, member in sheets:
        if name == sheet:
            return member
    raise KeyError(f"sheet {sheet!r} not in workbook "
                   f"(has {[s for s, _ in sheets]})")


def _col_index(cell_ref: str) -> int:
    """'BC12' -> 0-based column 54."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx_rows(path: str, sheet: str | int | None = None) -> list[list]:
    """Parse one worksheet into a list of rows (list of str/float/None)."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        member = _sheet_member(zf, sheet)
        root = ET.fromstring(zf.read(member))
    rows: list[list] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{_NS}c"):
            v = c.find(f"{_NS}v")
            if v is None or v.text is None:
                # inline strings live under <is><t>
                inline = c.find(f"{_NS}is")
                if inline is not None:
                    cells[_col_index(c.get("r"))] = "".join(
                        t.text or "" for t in inline.iter(f"{_NS}t"))
                continue
            t = c.get("t", "n")
            if t == "s":
                val: object = strings[int(v.text)]
            elif t in ("str", "inlineStr"):
                val = v.text
            elif t == "b":
                val = v.text == "1"
            else:  # numeric
                f = float(v.text)
                val = int(f) if f.is_integer() else f
            cells[_col_index(c.get("r"))] = val
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_xlsx(spark: SparkSession, path: str,
              sheet: str | int | None = None,
              header: bool = True) -> DataFrame:
    """Excel worksheet -> DataFrame (S5, `check_import_status.R:17-22`).

    Driver-side parse (metadata sheets are small by design in the
    reference); all columns StringType — downstream loaders apply the
    pinned schema exactly as the reference pipes ``read_excel`` output
    through typed Postgres appends.
    """
    try:  # richer path if the optional deps exist in this environment
        import pandas as pd  # noqa: F401
        import openpyxl  # noqa: F401
        # header=None when the caller wants raw rows: letting pandas consume
        # row 0 as a header would dedup-rename ('S001.1'), invent
        # 'Unnamed: N' for blanks, and coerce values — then emit that
        # mangled row as DATA. The stdlib fallback returns true raw rows;
        # both paths must agree.
        pdf = pd.read_excel(path, sheet_name=sheet if sheet is not None else 0,
                            header=0 if header else None)
        pdf = pdf.astype(object).where(pdf.notna(), None)
        rows = (([list(pdf.columns)] if header else [])
                + pdf.values.tolist())
    except ImportError:
        rows = read_xlsx_rows(path, sheet)
    if not rows:
        raise ValueError(f"empty worksheet in {path}")
    if header:
        names, data = [str(c) for c in rows[0]], rows[1:]
    else:
        names = [f"c{i}" for i in range(len(rows[0]))]
        data = rows
    data = [[None if v is None else str(v) for v in r] for r in data]
    return spark.createDataFrame(data, schema=", ".join(
        f"`{n}` string" for n in names))


def _col_ref(idx: int) -> str:
    """0-based column index -> A1-style letters (0->A, 26->AA)."""
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def write_xlsx(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Minimal single-sheet ``.xlsx`` writer (the S5 sink twin of
    ``read_xlsx``): stdlib zipfile + escaped SpreadsheetML, no third-party
    Excel library. Strings go as inline strings (``t="inlineStr"``, with
    ``xml:space="preserve"`` so edge whitespace survives), bools as
    ``t="b"``, ints/floats as numeric cells, ``None`` as an omitted cell —
    exactly the cell classes ``read_xlsx_rows`` parses, so a write->read
    round-trip is identity up to xlsx's value model (everything is text or
    a double). Driver-side by the same contract as the reader: metadata
    sheets, never a bulk-data path.
    """
    import math
    from xml.sax.saxutils import escape, quoteattr

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_ref(c)}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, float) and not math.isfinite(v):
            # Excel's numeric cell model has no NaN/inf — emit an inline
            # string so external readers (openpyxl/Excel) don't see a
            # corrupt part; our own reader round-trips it as text.
            s = escape(repr(v))
            return (f'<c r="{ref}" t="inlineStr">'
                    f'<is><t xml:space="preserve">{s}</t></is></c>')
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        s = escape(str(v))
        return (f'<c r="{ref}" t="inlineStr">'
                f'<is><t xml:space="preserve">{s}</t></is></c>')

    body = "".join(
        f'<row r="{ri + 1}">'
        + "".join(cell(ri, ci, v) for ci, v in enumerate(row)) + "</row>"
        for ri, row in enumerate(rows))
    sheet = ('<?xml version="1.0"?><worksheet xmlns="http://schemas.'
             'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
             + body + "</sheetData></worksheet>")
    ct = ('<?xml version="1.0"?><Types xmlns="http://schemas.'
          'openxmlformats.org/package/2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
          'worksheet+xml"/></Types>')
    root_rels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.'
                 'openxmlformats.org/package/2006/relationships">'
                 '<Relationship Id="rId1" Type="http://schemas.'
                 'openxmlformats.org/officeDocument/2006/relationships/'
                 'officeDocument" Target="xl/workbook.xml"/></Relationships>')
    wb = ('<?xml version="1.0"?><workbook xmlns="http://schemas.'
          'openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://'
          'schemas.openxmlformats.org/officeDocument/2006/relationships">'
          f'<sheets><sheet name={quoteattr(sheet_name)} sheetId="1" '
          'r:id="rId1"/></sheets></workbook>')
    wb_rels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.'
               'openxmlformats.org/package/2006/relationships">'
               '<Relationship Id="rId1" Type="http://schemas.'
               'openxmlformats.org/officeDocument/2006/relationships/'
               'worksheet" Target="worksheets/sheet1.xml"/></Relationships>')
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
