"""Minimal openpyxl replacement for the parity harness (this file is
copied to <workdir>/wandb_stub/openpyxl/__init__.py).

The reference's CDC dumps every affinity matrix with
``pd.DataFrame(matrix).to_excel(path)`` (/root/reference/model/cdc.py:400)
and this image ships no openpyxl, so the reference would crash inside its
first ``update_group``.  This stub implements exactly the surface pandas'
OpenpyxlWriter touches (Workbook/worksheet/cell + style classes it
instantiates) and ``Workbook.save`` emits a real SpreadsheetML zip —
numbers and inline strings, no styling — so the reference runs unmodified
and still produces readable .xlsx artifacts.

Write-only: ``load_workbook`` raises (pandas only calls it for mode='a').
"""

import zipfile

__version__ = "3.1.5"  # satisfies pandas' minimum-version check


class _Cell:
    def __init__(self, sheet, row, col):
        d = object.__getattribute__(self, "__dict__")
        d["_sheet"], d["_row"], d["_col"] = sheet, row, col

    @property
    def value(self):
        return self._sheet._cells.get((self._row, self._col))

    def __setattr__(self, name, v):
        if name == "value":
            self._sheet._cells[(self._row, self._col)] = v
        # styles/number_format/font/border/... -> accepted and ignored


class Worksheet:
    def __init__(self, title="Sheet1"):
        self.title = title
        self.freeze_panes = None
        self._cells = {}

    def cell(self, row, column):
        return _Cell(self, row, column)

    def merge_cells(self, **kwargs):  # content parity only; merges dropped
        pass


def _col_name(j):
    name = ""
    while j:
        j, rem = divmod(j - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def _xml_escape(s):
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))


class Workbook:
    def __init__(self, **kwargs):
        self.worksheets = [Worksheet()]

    @property
    def sheetnames(self):
        return [ws.title for ws in self.worksheets]

    def remove(self, ws):
        self.worksheets.remove(ws)

    def create_sheet(self, title=None, index=None):
        ws = Worksheet(title or f"Sheet{len(self.worksheets) + 1}")
        if index is None:
            self.worksheets.append(ws)
        else:
            self.worksheets.insert(index, ws)
        return ws

    def save(self, path_or_handle):
        n = max(len(self.worksheets), 1)
        ct = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
              'content-types"><Default Extension="rels" ContentType='
              '"application/vnd.openxmlformats-package.relationships+xml"/>'
              '<Default Extension="xml" ContentType="application/xml"/>'
              '<Override PartName="/xl/workbook.xml" ContentType="application'
              '/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main'
              '+xml"/>']
        sheets_xml, wb_sheets, wb_rels = [], [], []
        for i, ws in enumerate(self.worksheets or [Worksheet()], 1):
            ct.append(f'<Override PartName="/xl/worksheets/sheet{i}.xml" '
                      'ContentType="application/vnd.openxmlformats-'
                      'officedocument.spreadsheetml.worksheet+xml"/>')
            wb_sheets.append(f'<sheet name="{_xml_escape(ws.title)}" '
                             f'sheetId="{i}" r:id="rId{i}"/>')
            wb_rels.append(
                f'<Relationship Id="rId{i}" Type="http://schemas.openxml'
                'formats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i}.xml"/>')
            by_row = {}
            for (r, c), v in sorted(ws._cells.items()):
                by_row.setdefault(r, []).append((c, v))
            rows = []
            for r in sorted(by_row):
                cells = []
                for c, v in by_row[r]:
                    ref = f"{_col_name(c)}{r}"
                    if v is None:
                        cells.append(f'<c r="{ref}"/>')
                    elif isinstance(v, bool):
                        cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                    elif isinstance(v, (int, float)):
                        if v != v or v in (float("inf"), float("-inf")):
                            cells.append(f'<c r="{ref}"/>')  # non-finite
                        else:
                            cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
                    else:
                        cells.append(f'<c r="{ref}" t="inlineStr"><is><t>'
                                     f'{_xml_escape(str(v))}</t></is></c>')
                rows.append(f'<row r="{r}">' + "".join(cells) + "</row>")
            sheets_xml.append(
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>' + "".join(rows) +
                "</sheetData></worksheet>")
        ct.append("</Types>")
        workbook = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml'
            '/2006/main" xmlns:r="http://schemas.openxmlformats.org/office'
            'Document/2006/relationships"><sheets>' + "".join(wb_sheets) +
            "</sheets></workbook>")
        rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships"><Relationship Id="rId1" Type='
                '"http://schemas.openxmlformats.org/officeDocument/2006/'
                'relationships/officeDocument" Target="xl/workbook.xml"/>'
                "</Relationships>")
        wb_rels_xml = ('<?xml version="1.0" encoding="UTF-8" standalone='
                       '"yes"?><Relationships xmlns="http://schemas.openxml'
                       'formats.org/package/2006/relationships">' +
                       "".join(wb_rels) + "</Relationships>")
        with zipfile.ZipFile(path_or_handle, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("[Content_Types].xml", "".join(ct))
            zf.writestr("_rels/.rels", rels)
            zf.writestr("xl/workbook.xml", workbook)
            zf.writestr("xl/_rels/workbook.xml.rels", wb_rels_xml)
            for i in range(1, n + 1):
                zf.writestr(f"xl/worksheets/sheet{i}.xml", sheets_xml[i - 1])


def load_workbook(*args, **kwargs):
    raise NotImplementedError("openpyxl stub is write-only")


class _Style:
    """Accepts any ctor signature; pandas only instantiates + assigns."""

    def __init__(self, *args, **kwargs):
        pass


# the classes pandas' _convert_to_style_kwargs may instantiate
Font = Fill = PatternFill = GradientFill = Border = Side = Alignment = \
    Protection = Color = NamedStyle = _Style
