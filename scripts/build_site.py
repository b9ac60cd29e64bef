"""Render docs/*.md into a static HTML microsite under site/.

Rebuild of the reference's published microsite
(reference/scripts/publishMicrosite.sh, reference/.travis.yml:14-16 — an
sbt-microsites/Jekyll build of docs/src/main/tut): same deliverable, a
browsable rendered site with the example figures, produced tpu-repo-native
instead — a dependency-free renderer for the exact markdown subset the
gpx docs use (headings, fenced code, GFM tables, unordered lists with
2-space continuations, images/links/inline code/emphasis). Everything
else in the docs is already *stronger* than the reference's tut pages
(every ```python block executes in CI, tests/test_docs.py); this adds the
visual-parity artifact.

Usage: python scripts/build_site.py [out_dir]   (default: site/)
"""
from __future__ import annotations

import html
import pathlib
import re
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"

CSS = """\
:root { --fg: #1a1d23; --dim: #5c6370; --bg: #ffffff; --code-bg: #f5f6f8;
        --accent: #0b63c5; --border: #e3e5e9; }
* { box-sizing: border-box; }
body { margin: 0; color: var(--fg); background: var(--bg);
       font: 16px/1.65 -apple-system, "Segoe UI", Roboto, sans-serif; }
.wrap { display: flex; max-width: 76rem; margin: 0 auto; }
nav { flex: 0 0 16rem; padding: 2rem 1.25rem; border-right: 1px solid
      var(--border); min-height: 100vh; }
nav h2 { font-size: 1rem; margin: 0 0 .75rem; }
nav a { display: block; color: var(--dim); text-decoration: none;
        padding: .2rem 0; font-size: .92rem; }
nav a:hover, nav a.active { color: var(--accent); }
main { flex: 1; padding: 2rem 2.5rem 4rem; min-width: 0; }
h1, h2, h3 { line-height: 1.3; }
h1 { font-size: 1.7rem; border-bottom: 1px solid var(--border);
     padding-bottom: .4rem; }
a { color: var(--accent); }
code { background: var(--code-bg); border-radius: 4px; padding: .1em .35em;
       font: .88em/1.5 "SF Mono", Menlo, Consolas, monospace; }
pre { background: var(--code-bg); border: 1px solid var(--border);
      border-radius: 8px; padding: .9rem 1.1rem; overflow-x: auto; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; display: block;
        overflow-x: auto; }
th, td { border: 1px solid var(--border); padding: .35rem .7rem;
         font-size: .92rem; text-align: left; }
th { background: var(--code-bg); }
img { max-width: 100%; }
footer { color: var(--dim); font-size: .85rem; margin-top: 3rem;
         border-top: 1px solid var(--border); padding-top: 1rem; }
"""

PAGE = """\
<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — gpx</title>
<link rel="stylesheet" href="style.css">
</head>
<body>
<div class="wrap">
<nav><h2><a href="index.html">gpx</a></h2>
{nav}
</nav>
<main>
{body}
<footer>gpx — TPU-native Gaussian processes. Every python block on this
page runs in CI (tests/test_docs.py). Built by scripts/build_site.py.</footer>
</main>
</div>
</body>
</html>
"""

_CODE_SPAN = re.compile(r"`([^`]+)`")
_IMAGE = re.compile(r"!\[([^\]]*)\]\(([^)\s]+)\)")
_LINK = re.compile(r"\[([^\]]+)\]\(([^)\s]+)\)")
_BOLD = re.compile(r"\*\*([^*]+)\*\*")
_ITAL = re.compile(r"\*([^*\s][^*]*?)\*")


def _href(url: str) -> str:
    """Rewrite intra-docs .md links to the rendered .html pages."""
    if url.startswith(("http://", "https://", "#", "mailto:")):
        return url
    return re.sub(r"\.md(#|$)", r".html\1", url)


def _inline(text: str) -> str:
    """Inline markdown -> HTML; code-span contents are protected from the
    emphasis/link rules (the docs put math like ``K^{-1}`` and ``*`` inside
    backticks)."""
    spans: list[str] = []

    def _stash(mo):
        spans.append(f"<code>{html.escape(mo.group(1))}</code>")
        return f"\x00{len(spans) - 1}\x00"

    def _attr(s: str) -> str:
        # attribute values sit in double quotes; escape them even though
        # the prose was escaped with quote=False
        return s.replace('"', "&quot;")

    text = _CODE_SPAN.sub(_stash, html.escape(text, quote=False))
    text = _IMAGE.sub(
        lambda m: (f'<img src="{_attr(_href(m.group(2)))}"'
                   f' alt="{_attr(m.group(1))}">'), text
    )
    text = _LINK.sub(
        lambda m: f'<a href="{_attr(_href(m.group(2)))}">{m.group(1)}</a>',
        text,
    )
    text = _BOLD.sub(r"<strong>\1</strong>", text)
    text = _ITAL.sub(r"<em>\1</em>", text)
    return re.sub(r"\x00(\d+)\x00", lambda m: spans[int(m.group(1))], text)


def _table(lines: list[str]) -> str:
    def cells(row):
        return [c.strip() for c in row.strip().strip("|").split("|")]

    head = cells(lines[0])
    out = ["<table>", "<thead><tr>"]
    out += [f"<th>{_inline(c)}</th>" for c in head]
    out.append("</tr></thead>")
    out.append("<tbody>")
    for row in lines[2:]:
        out.append("<tr>")
        out += [f"<td>{_inline(c)}</td>" for c in cells(row)]
        out.append("</tr>")
    out.append("</tbody></table>")
    return "\n".join(out)


def render(md: str) -> tuple[str, str]:
    """Markdown -> (title, HTML body) for the subset the gpx docs use."""
    lines = md.split("\n")
    out: list[str] = []
    title = ""
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            lang = line[3:].strip()
            j = i + 1
            while j < len(lines) and not lines[j].startswith("```"):
                j += 1
            code = html.escape("\n".join(lines[i + 1:j]))
            cls = f' class="language-{lang}"' if lang else ""
            out.append(f"<pre><code{cls}>{code}</code></pre>")
            i = j + 1
            continue
        m = re.match(r"(#{1,6}) +(.*)", line)
        if m:
            level = len(m.group(1))
            text = m.group(2).strip()
            if level == 1 and not title:
                title = text
            out.append(f"<h{level}>{_inline(text)}</h{level}>")
            i += 1
            continue
        if line.startswith("|") and i + 1 < len(lines) and re.match(
            r"^\|[\s\-:|]+\|?\s*$", lines[i + 1]
        ):
            j = i
            while j < len(lines) and lines[j].startswith("|"):
                j += 1
            out.append(_table(lines[i:j]))
            i = j
            continue
        if line.startswith("- "):
            items: list[str] = []
            while i < len(lines) and (
                lines[i].startswith("- ")
                or (items and lines[i].startswith("  ") and lines[i].strip())
            ):
                if lines[i].startswith("- "):
                    items.append(lines[i][2:].strip())
                else:
                    items[-1] += " " + lines[i].strip()
                i += 1
            out.append("<ul>")
            out += [f"<li>{_inline(it)}</li>" for it in items]
            out.append("</ul>")
            continue
        if not line.strip():
            i += 1
            continue
        para: list[str] = []
        while i < len(lines) and lines[i].strip() and not (
            lines[i].startswith(("```", "#", "|", "- "))
        ):
            para.append(lines[i].strip())
            i += 1
        out.append(f"<p>{_inline(' '.join(para))}</p>")
    return title, "\n".join(out)


def _page_order() -> list[pathlib.Path]:
    """index.md first, then the order its "Pages" list links them, then any
    stragglers alphabetically — the nav mirrors the front page."""
    index = DOCS / "index.md"
    order = [index]
    seen = {"index.md"}
    for m in _LINK.finditer(index.read_text()):
        name = m.group(2)
        if name.endswith(".md") and name not in seen and (DOCS / name).exists():
            order.append(DOCS / name)
            seen.add(name)
    for p in sorted(DOCS.glob("*.md")):
        if p.name not in seen:
            order.append(p)
    return order


def build(out_dir: pathlib.Path) -> list[pathlib.Path]:
    out_dir.mkdir(parents=True, exist_ok=True)
    pages = _page_order()
    rendered = [(p, *render(p.read_text())) for p in pages]
    written = []
    for page, _, _ in rendered:
        dest = out_dir / (page.stem + ".html")
        nav = "\n".join(
            '<a href="{0}.html"{2}>{1}</a>'.format(
                p.stem, t or p.stem, ' class="active"' if p is page else ""
            )
            for p, t, _ in rendered
        )
        _, title, body = next(r for r in rendered if r[0] is page)
        dest.write_text(PAGE.format(title=title or page.stem, nav=nav,
                                    body=body))
        written.append(dest)
    (out_dir / "style.css").write_text(CSS)
    figs = DOCS / "figures"
    if figs.is_dir():
        shutil.copytree(figs, out_dir / "figures", dirs_exist_ok=True)
    return written


def main() -> None:
    out = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "site"
    written = build(out)
    print(f"site: {len(written)} pages -> {out}")


if __name__ == "__main__":
    main()
