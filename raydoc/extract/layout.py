"""PDF layout parsing: stateful layout "model" with table-structure
recognition and reading-order resolution.

North-star requirement (BASELINE.json): "PDF layout parsing with actor
pools hosting stateful layout/OCR models (table-structure recognition,
reading-order resolution)". No PDF/OCR libraries exist in this
container, so the CODEC boundary is explicit and stubbed (a real
deployment plugs pdfminer/OCR into ``LayoutModel.decode``); the layout
ALGORITHMS — column detection, reading-order resolution, table cell
grid reconstruction — are real, deterministic, and tested against
golden orders.

Fake-PDF payload (deterministic): b"FPDF" + JSON of pages, each a list
of blocks ``{bbox: [x0, y0, x1, y1], kind: title|text|cell, text}`` in
SHUFFLED storage order (real PDF content streams are unordered — the
whole point of reading-order resolution).

Coordinate system: origin top-left, y grows downward, page width 612.
"""

from __future__ import annotations

import json
import random

import numpy as np

__all__ = ["LayoutModel", "make_fake_pdf", "PAGE_W"]

PAGE_W = 612.0


def make_fake_pdf(doc_id: int, seed: int = 42) -> tuple[bytes, str]:
    """Deterministic fake PDF for tests: returns (payload, golden_text)
    where golden_text is the correct reading-order extraction."""
    rng = random.Random(f"pdf:{seed}:{doc_id}")
    n_pages = rng.randint(1, 3)
    two_col = rng.random() < 0.5
    pages = []
    golden_parts: list[str] = []
    for p in range(n_pages):
        blocks: list[dict] = []
        golden_page: list[str] = []

        def add_column(x0: float, x1: float, col_tag: str) -> None:
            y = 60.0
            for bi in range(rng.randint(2, 4)):
                kind = "title" if bi == 0 else "text"
                txt = f"p{p}-{col_tag}-{bi} " + " ".join(
                    f"w{rng.randint(0, 99)}" for _ in range(rng.randint(4, 10))
                )
                h = 14.0 if kind == "title" else rng.uniform(30, 60)
                blocks.append(
                    {"bbox": [x0, y, x1, y + h], "kind": kind, "text": txt}
                )
                golden_page.append(txt)
                y += h + 10.0
            return

        if two_col:
            add_column(36.0, PAGE_W / 2 - 10, "L")
            left_golden = list(golden_page)
            golden_page.clear()
            add_column(PAGE_W / 2 + 10, PAGE_W - 36, "R")
            right_golden = list(golden_page)
            golden_page[:] = left_golden + right_golden
        else:
            add_column(36.0, PAGE_W - 36, "C")

        # a table on some pages: grid of cells with known structure
        if rng.random() < 0.6:
            nr, nc = rng.randint(2, 4), rng.randint(2, 3)
            ty = 640.0
            x_step = (PAGE_W - 72) / nc
            trows = []
            for r in range(nr):
                cells = []
                for c in range(nc):
                    txt = f"cell{p}r{r}c{c}"
                    blocks.append(
                        {
                            "bbox": [36 + c * x_step, ty + r * 20,
                                     36 + (c + 1) * x_step - 4, ty + r * 20 + 16],
                            "kind": "cell",
                            "text": txt,
                        }
                    )
                    cells.append(txt)
                trows.append(" | ".join(cells))
            golden_page.append("\n".join(trows))

        rng.shuffle(blocks)  # storage order != reading order
        pages.append(blocks)
        golden_parts.extend(golden_page)
    payload = b"FPDF" + json.dumps(pages).encode("utf-8")
    return payload, "\n".join(golden_parts)


class LayoutModel:
    """The stateful layout/OCR model an actor hosts.

    __init__ is the once-per-actor model-load slot (the reference builds
    its LLMBundle per run at generate.py:150; here the analogue weights
    are the layout thresholds). decode() is the stubbed codec boundary.
    """

    def __init__(self, codec: str = "fake", col_gap_frac: float = 0.04,
                 row_tol: float = 8.0) -> None:
        if codec not in ("fake",):
            raise NotImplementedError(
                "real PDF codecs (pdfminer/OCR) unavailable in this "
                "environment; plug a decode(payload)->pages here"
            )
        self.col_gap = PAGE_W * col_gap_frac
        self.row_tol = row_tol

    # -- codec boundary ----------------------------------------------------
    def decode(self, payload: bytes) -> list[list[dict]]:
        if payload[:4] != b"FPDF":
            raise ValueError("not a fake-PDF payload")
        return json.loads(payload[4:].decode("utf-8"))

    # -- layout algorithms (real) -----------------------------------------
    def split_columns(self, blocks: list[dict]) -> list[list[dict]]:
        """Detect a k-column layout (k >= 1): sort non-cell block
        x-centers and split at EVERY gap exceeding ``col_gap`` whose
        midpoint lies in the page interior — so 2- and 3-column pages
        both resolve (r03; r02 handled exactly 2). Returns columns
        left-to-right."""
        body = [b for b in blocks if b["kind"] != "cell"]
        if len(body) < 2:
            return [blocks]
        centers = sorted((b["bbox"][0] + b["bbox"][2]) / 2 for b in body)
        bounds: list[float] = []
        for i in range(len(centers) - 1):
            gap = centers[i + 1] - centers[i]
            mid = (centers[i] + centers[i + 1]) / 2
            if gap >= self.col_gap and PAGE_W * 0.15 < mid < PAGE_W * 0.85:
                bounds.append(mid)
        if not bounds:
            return [blocks]
        cols: list[list[dict]] = [[] for _ in range(len(bounds) + 1)]
        for b in blocks:
            c = (b["bbox"][0] + b["bbox"][2]) / 2
            k = sum(c > m for m in bounds)
            cols[k].append(b)
        return [c for c in cols if c]

    def reading_order(self, blocks: list[dict]) -> list[dict]:
        """Column split, then top-to-bottom / left-to-right within each
        column. A table is placed AT ITS PAGE POSITION (r03; r02 always
        appended it last): body blocks whose vertical center is above
        the table's top read first, then the reconstructed table, then
        the rest — the order a human reads a table sandwiched between
        paragraphs."""
        cells = [b for b in blocks if b["kind"] == "cell"]
        body = [b for b in blocks if b["kind"] != "cell"]

        def _cols(bs: list[dict]) -> list[dict]:
            out: list[dict] = []
            for col in self.split_columns(bs):
                out.extend(
                    sorted(col, key=lambda b: (b["bbox"][1], b["bbox"][0]))
                )
            return out

        if not cells:
            return _cols(body)
        t_top = min(c["bbox"][1] for c in cells)
        above = [b for b in body
                 if (b["bbox"][1] + b["bbox"][3]) / 2 < t_top]
        below = [b for b in body
                 if (b["bbox"][1] + b["bbox"][3]) / 2 >= t_top]
        table = {"kind": "table", "text": self.table_structure(cells),
                 "bbox": [0, t_top, PAGE_W, t_top]}
        return _cols(above) + [table] + _cols(below)

    def table_structure(self, cells: list[dict]) -> str:
        """Cell-grid reconstruction: cluster cells into rows by their
        TOP edge (within row_tol) — a ROW-SPANNING cell shares its top
        with the row it starts in, so it reads once, in that row (r03;
        center-clustering put tall cells between rows). Cells in each
        row sort by x; a COL-SPANNING cell is simply one wide entry of
        its row -> 'a | b | c' lines."""
        if not cells:
            return ""
        ys = np.array([c["bbox"][1] for c in cells])
        order = np.argsort(ys, kind="stable")
        rows: list[list[int]] = []
        cur: list[int] = []
        row_y = None  # anchor = the row's FIRST top (not a drifting last)
        for i in order:
            y = ys[i]
            if row_y is None or y - row_y <= self.row_tol:
                cur.append(int(i))
                if row_y is None:
                    row_y = y
            else:
                rows.append(cur)
                cur = [int(i)]
                row_y = y
        rows.append(cur)
        lines = []
        for row in rows:
            row_sorted = sorted(row, key=lambda i: cells[i]["bbox"][0])
            lines.append(" | ".join(cells[i]["text"] for i in row_sorted))
        return "\n".join(lines)

    # -- end-to-end --------------------------------------------------------
    def extract(self, payload: bytes) -> dict:
        """payload -> {"text", "spans", "status", "error"} with the same
        span contract as html extraction (chunker-compatible)."""
        try:
            pages = self.decode(payload)
            parts: list[str] = []
            spans: list[dict] = []
            pos = 0
            for blocks in pages:
                for b in self.reading_order(blocks):
                    t = b["text"]
                    if not t:
                        continue
                    kind = {"title": "title", "table": "table"}.get(b["kind"], "para")
                    level = 1 if kind == "title" else 0
                    spans.append({"start": pos, "end": pos + len(t),
                                  "kind": kind, "level": level})
                    parts.append(t)
                    pos += len(t) + 1
            if not parts:
                return {"text": "", "spans": [], "status": "empty", "error": ""}
            return {"text": "\n".join(parts), "spans": spans,
                    "status": "ok", "error": ""}
        except Exception as e:
            return {"text": "", "spans": [], "status": "error",
                    "error": repr(e)[:500]}
