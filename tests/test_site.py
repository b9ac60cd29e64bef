"""The rendered docs microsite (scripts/build_site.py) — the rebuild of
the reference's published site (reference/scripts/publishMicrosite.sh).

These are structural checks on the generated HTML: every docs page
renders, intra-site links resolve, markdown artifacts don't leak through,
and code/figures survive. The *content* of the pages is already executed
by tests/test_docs.py."""

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import pytest  # noqa: E402

import build_site  # noqa: E402


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    out = tmp_path_factory.mktemp("site")
    build_site.build(out)
    return out


def test_every_docs_page_renders(site):
    md = {p.stem for p in (REPO / "docs").glob("*.md")}
    rendered = {p.stem for p in site.glob("*.html")}
    assert md <= rendered, md - rendered
    assert (site / "style.css").exists()


def test_intra_site_links_resolve(site):
    for page in site.glob("*.html"):
        for href in re.findall(r'(?:href|src)="([^"]+)"', page.read_text()):
            if href.startswith(("http://", "https://", "#", "mailto:")):
                continue
            target = site / href.split("#")[0]
            assert target.exists(), f"{page.name}: dangling link {href}"


def test_no_markdown_leaks(site):
    for page in site.glob("*.html"):
        text = page.read_text()
        # fence markers at line starts and .md links must not survive
        # rendering (index.md legitimately says "every ```python block"
        # mid-sentence, so only line-start fences count as leaks)
        assert not re.search(r"(?m)^```", text), page.name
        assert not re.search(r'href="[^"]*\.md[#"]', text), page.name
        # no unconverted markdown images/links in rendered prose
        body = re.sub(r"<(pre|code)>.*?</\1>", "", text, flags=re.S)
        assert not re.search(r"!\[[^\]]*\]\(", body), page.name


def test_code_and_tables_render(site):
    index = (site / "index.html").read_text()
    assert '<code class="language-python">' in index
    assert "<table>" in index
    assert '<img src="figures/fitted_gp.png"' in index
    assert (site / "figures" / "fitted_gp.png").exists()
    # code contents are escaped verbatim (the docs model definition)
    assert "gpx.se(3.0, 5.5) + gpx.white(0.5)" in index


def test_inline_code_protects_contents(site):
    # large_n.md has math-ish text inside backticks (K^{-1}, O(...)) that
    # the emphasis/link rules must not mangle
    page = (site / "large_n.html").read_text()
    assert "<code>" in page
    assert "\x00" not in page


def test_nav_lists_every_page_in_index_order(site):
    nav = re.findall(
        r'<a href="([a-z_]+)\.html"', (site / "index.html").read_text()
    )
    assert nav[0] == "index" and nav[1] == "index"  # brand link + nav entry
    md = {p.stem for p in (REPO / "docs").glob("*.md")}
    assert md <= set(nav)
