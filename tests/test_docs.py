"""Docs cite only artifacts that exist.

Three review rounds in a row found a committed doc citing a file that was
never written (or had been wiped): r2 PARITY vs suite count, r3 BASELINE
citing a timed-out bench artifact, r4 dress_rehearsal.py promising a
docs/DRESS_REHEARSAL.md that did not exist.  This test makes the failure
class structural: every repo-relative file path cited in the top-level
markdown records must resolve in the working tree.

Ephemeral paths (`.cache/…`, `checkpoints/…`, `out/…`, `/tmp/…`) are
exempt — they are runtime locations, legitimately absent from a fresh
clone — but a doc must not present them as "the record" (covered by the
wording reviews, not automatable).
"""
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

DOCS = sorted(
    p for p in [*REPO.glob("*.md"), *(REPO / "docs").glob("*.md")]
    if p.name not in ("VERDICT.md", "ADVICE.md", "PAPERS.md", "SNIPPETS.md",
                      "SURVEY.md")
)  # judge/advisor/retrieval/survey files cite external trees (the torch
#    reference's layout), not this repo

# A citation: a path-ish token rooted at a real top-level repo dir (or a
# known repo file), with a file extension.  Plain prose words don't match.
_ROOTS = (
    # "assembly/…", "data/…" etc. are accepted as shorthand for
    # tera_mind_tpu/<same> (the docs and the judge both use it).
    "tera_mind_tpu", "tests", "scripts", "docs", "assembly", "assets",
    "models", "ops", "parallel", "metrics", "cli", "diffusion", "training",
)
_FILES = (
    "bench.py", "__graft_entry__.py", "SURVEY.md", "BASELINE.md",
    "PARITY.md", "README.md",
)
_PAT = re.compile(
    r"(?<![\w/.-])((?:%s)/[\w./-]+\.\w{1,4}|%s)(?![\w-])"
    % ("|".join(_ROOTS), "|".join(re.escape(f) for f in _FILES))
)
# Paths under these prefixes are runtime outputs, never repo artifacts.
_EPHEMERAL = (".cache/", "checkpoints/", "out/", "/tmp/", "data/")


def _citations(text):
    # Strip fenced code blocks: usage examples legitimately name output
    # paths a user will create (out/roi, checkpoints/...).
    text = re.sub(r"```.*?```", "", text, flags=re.S)
    for m in _PAT.finditer(text):
        tok = m.group(1).rstrip(".")
        # "file.py:123" line anchors
        tok = tok.split(":")[0]
        if tok.startswith(_EPHEMERAL):
            continue
        # Globs and placeholder paths are descriptions, not citations.
        if any(c in tok for c in "*<>{}"):
            continue
        yield tok


@pytest.mark.parametrize("doc", DOCS, ids=lambda p: str(p.relative_to(REPO)))
def test_cited_paths_exist(doc):
    _EXTS = {"py", "md", "cc", "h", "json", "csv", "sh", "txt", "yaml",
             "yml", "toml", "tif", "tiff", "png", "npz", "zip", "ipynb"}

    def exists(tok):
        cands = [tok]
        suffix = tok.rsplit(".", 1)[-1]
        if suffix not in _EXTS:
            # "cli/attn._vis" → a function inside cli/attn.py, not a file
            cands.append(tok.rsplit(".", 1)[0] + ".py")
        return any((REPO / c).exists() or (REPO / "tera_mind_tpu" / c).exists()
                   for c in cands)

    missing = sorted({tok for tok in _citations(doc.read_text())
                      if not exists(tok)})
    assert not missing, (
        f"{doc.relative_to(REPO)} cites repo paths that do not exist: "
        f"{missing} — write docs AFTER the run, from the run's output"
    )
