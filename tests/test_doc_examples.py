"""README code blocks compile and run (the reference CI extracts and
builds its README examples -- .github/workflows/rust.yml README-example
job + skeptic book tests; SURVEY.md section 4 item 6)."""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _python_blocks(md_path):
    text = (REPO / md_path).read_text()
    return re.findall(r"```python\n(.*?)```", text, re.S)


def test_readme_examples_run():
    blocks = _python_blocks("README.md")
    assert blocks, "README has no python blocks?"
    ns = {}
    for i, block in enumerate(blocks):
        exec(compile(block, f"README.md[block {i}]", "exec"), ns)
    # the first block leaves a solved logistic-decay Solution around
    sol = ns.get("sol")
    assert sol is not None and int(sol.stop_reason) >= 0
    import numpy as np

    # dy/dt = -0.1 y, y(0)=1 at t=1
    assert abs(float(np.asarray(sol.ys)[-1, 0]) - np.exp(-0.1)) < 1e-6
