"""Executable documentation: every ```python block in docs/ must run —
the rebuild of the reference's tut compile-checked microsite
(docs/src/main/tut/**, SURVEY.md §4 'the effective test suite')."""

import pathlib
import re

import pytest

DOCS = sorted((pathlib.Path(__file__).parent.parent / "docs").glob("*.md"))


def _blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


@pytest.mark.parametrize("doc", DOCS, ids=[d.stem for d in DOCS])
def test_doc_code_runs(doc):
    blocks = _blocks(doc)
    assert blocks, f"{doc.name} has no python blocks"
    ns = {}
    for block in blocks:
        exec(compile(block, f"{doc.name}", "exec"), ns)
