"""Minimal dependency-free PDF writer for the report sink (reference S14).

The reference renders its report with fpdf (app_v3.py:514-643); fpdf is not in
this environment, so this module emits the same artifact surface from scratch:
a valid PDF 1.4 document of Helvetica text pages, built directly from the PDF
object model (catalog → pages → page → content stream + font). Only the
features the report needs are implemented — text lines at three sizes with
automatic pagination — which keeps the writer ~100 lines and auditable.

Layout mirrors the fpdf report: title line, metadata line, a global-score
heading, one line per dimension, the worst-columns table, and issues grouped
by severity — the same content `score_report_markdown` renders, so the two
artifacts can never drift (the PDF is generated FROM the markdown lines).
"""

from __future__ import annotations

PAGE_W, PAGE_H = 595, 842  # A4 in points
MARGIN = 50
SIZES = {"h1": 18, "h2": 14, "h3": 12, "body": 10}
LEADING = {"h1": 26, "h2": 20, "h3": 16, "body": 14}


def _esc(s: str) -> bytes:
    out = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return out.encode("latin-1", "replace")


def _classify(md_line: str) -> tuple[str, str]:
    """Map a markdown report line to (style, text)."""
    if md_line.startswith("# "):
        return "h1", md_line[2:]
    if md_line.startswith("## "):
        return "h2", md_line[3:]
    if md_line.startswith("### "):
        return "h3", md_line[4:]
    if md_line.startswith("| ---"):
        return "skip", ""
    if md_line.startswith("|"):
        cells = [c.strip() for c in md_line.strip("|").split("|")]
        return "body", "   ".join(f"{c:<24}" if i == 0 else c for i, c in enumerate(cells))
    return "body", md_line.replace("*", "").replace("`", "")


def render_pdf_lines(md_lines: list[str]) -> bytes:
    """Render markdown-ish report lines into a single-font paginated PDF."""
    # 1. content streams, paginated
    pages: list[bytes] = []
    buf: list[bytes] = []
    y = PAGE_H - MARGIN

    def flush():
        nonlocal buf, y
        if buf:
            pages.append(b"BT\n" + b"".join(buf) + b"ET\n")
        buf = []
        y = PAGE_H - MARGIN

    for raw in md_lines:
        style, text = _classify(raw)
        if style == "skip":
            continue
        lead = LEADING[style]
        if y - lead < MARGIN:
            flush()
        y -= lead
        if text:
            buf.append(
                b"/F1 %d Tf 1 0 0 1 %d %d Tm (%s) Tj\n"
                % (SIZES[style], MARGIN, y, _esc(text))
            )
    flush()
    if not pages:
        pages = [b"BT ET\n"]

    # 2. object table: 1 catalog, 2 pages-root, 3 font, then per page (page obj,
    # stream obj)
    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, stream in enumerate(pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                f"/Resources << /Font << /F1 3 0 R >> >> /Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        objs.append(b"<< /Length %d >>\nstream\n%sendstream" % (len(stream), stream))

    # 3. serialize with xref
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def score_report_pdf(ts, path: str) -> str:
    """Render a TableScore to PDF (same content as the markdown report)."""
    from data_quality_check_spark.operators.report import score_report_markdown

    data = render_pdf_lines(score_report_markdown(ts).splitlines())
    with open(path, "wb") as f:
        f.write(data)
    return path
