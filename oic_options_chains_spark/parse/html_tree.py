"""Shared HTML table-tree parsing for the X1/X2 kernels.

A minimal stdlib ``html.parser`` walk that mirrors what the reference's
sxpath navigation consumes (transform-load.2025-08-19.rkt:242-260;
transform-load.rkt:47-64): nested tables, per-cell text segments,
per-cell ``<span>`` texts, and ``onmouseover`` attribute values (the OCC
option symbols live there in the legacy chain pages).
"""

from __future__ import annotations

from html.parser import HTMLParser


class Cell:
    __slots__ = ("texts", "span_texts", "mouseovers", "tables")

    def __init__(self) -> None:
        self.texts: list[str] = []       # all text chunks in the cell
        self.span_texts: list[str] = []  # chunks inside <span> (legacy grids)
        self.mouseovers: list[str] = []  # onmouseover attr values
        self.tables: list[list] = []     # nested tables


class TableTreeParser(HTMLParser):
    """Builds a tree of tables: table = list of rows, row = list of Cell."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.top_tables: list[list] = []
        self._table_stack: list[list] = []
        self._cell_stack: list[Cell] = []
        self._span_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            table: list = []
            if self._cell_stack:
                self._cell_stack[-1].tables.append(table)
            else:
                self.top_tables.append(table)
            self._table_stack.append(table)
        elif tag == "tr" and self._table_stack:
            self._table_stack[-1].append([])
        elif tag in ("td", "th") and self._table_stack:
            rows = self._table_stack[-1]
            if not rows:
                rows.append([])
            cell = Cell()
            rows[-1].append(cell)
            self._cell_stack.append(cell)
        elif tag == "span" and self._cell_stack:
            self._span_depth += 1
        if self._cell_stack:
            for name, value in attrs:
                if name == "onmouseover" and value:
                    self._cell_stack[-1].mouseovers.append(value)

    def handle_endtag(self, tag: str) -> None:
        if tag == "table" and self._table_stack:
            self._table_stack.pop()
        elif tag in ("td", "th") and self._cell_stack:
            self._cell_stack.pop()
            self._span_depth = 0
        elif tag == "span" and self._span_depth:
            self._span_depth -= 1

    def handle_data(self, data: str) -> None:
        text = data.replace("\xa0", " ").strip()
        if text and self._cell_stack:
            self._cell_stack[-1].texts.append(text)
            if self._span_depth:
                self._cell_stack[-1].span_texts.append(text)


def clean_html(html: str) -> str:
    """The reference's pre-parse cleanup
    (transform-load.2025-08-19.rkt:243-250)."""
    out = (
        html.replace("\r\n", "")
        .replace("\n", "")
        .replace("\t", "")
        .replace("&nbsp;", " ")
        .replace("<nobr>", "")
        .replace("</nobr>", "")
    )
    while "  " in out:
        out = out.replace("  ", " ")
    return out


def parse_tables(html: str) -> list[list]:
    parser = TableTreeParser()
    parser.feed(clean_html(html))
    return parser.top_tables


def nested_tables(table: list) -> list[list]:
    """Tables directly inside any cell of ``table``, document order."""
    return [t for row in table for cell in row for t in cell.tables]


def first_inner_table(table: list) -> list:
    for row in table:
        if row and row[0].tables:
            return row[0].tables[0]
    raise ValueError("no inner table under (tr)(td 1)")
