"""Doc-embedded test counts must match reality (VERDICT r04 §weak-6: the
hand-written numbers in README.md rotted three rounds in a row — this test
ends the drift by failing the gate whenever the suite grows without the
docs following)."""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_readme_test_counts_match_collection():
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=ROOT, capture_output=True, text=True, timeout=600).stdout
    m = re.search(r"(\d+)/(\d+) tests collected \((\d+) deselected\)", out)
    assert m, f"unparseable collect-only tail: {out[-300:]}"
    fast, total, slow = (int(g) for g in m.groups())
    assert fast + slow == total

    readme = (ROOT / "README.md").read_text()
    m_fast = re.search(r"fast gate: (\d+) tests", readme)
    m_slow = re.search(r"the (\d+)-test slow set", readme)
    assert m_fast and m_slow, "README.md lost its test-count sentence"
    assert int(m_fast.group(1)) == fast, (
        f"README.md says the fast gate has {m_fast.group(1)} tests; "
        f"collection finds {fast} — update README.md:248")
    assert int(m_slow.group(1)) == slow, (
        f"README.md says the slow set has {m_slow.group(1)} tests; "
        f"collection finds {slow} — update README.md:248")
