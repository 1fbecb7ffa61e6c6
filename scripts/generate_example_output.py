#!/usr/bin/env python
"""Regenerate the example golden outputs (refOutput equivalent).

Mirrors the reference's scripts/generate_example_output.sh: runs every
example config through the CLI, normalizes the output the same way
compare_output does (timestamps, times and paths masked) and stores it
under examples/refOutput/.  The stored files are the committed goldens
that scripts/compare_output.py diffs against.

Usage:  python scripts/generate_example_output.py [outdir]
"""

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXAMPLES = ["ex1.yml", "ex1-jacobi.yml", "ex2.yml", "ex3.yml", "ex4.yml",
            "ex5.yml", "ex6.yml", "ex7.yml", "ex8.yml"]

MASKS = [
    (re.compile(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"),
     "YYYY-MM-DD HH:MM:SS"),
    (re.compile(r"\|\s+[0-9]+\.[0-9]{3}\s+\|"), "|     MASKED |"),
    (re.compile(r"total\s+[0-9.]+ \[ms\]"), "total MASKED [ms]"),
    (re.compile(re.escape(REPO)), "${REPO}"),
]


def normalize(text: str) -> str:
    for pat, repl in MASKS:
        text = pat.sub(repl, text)
    return text


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    os.chdir(REPO)
    outdir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "examples", "refOutput")
    os.makedirs(outdir, exist_ok=True)

    from hypredrive_tpu.cli import run_one_config

    for cfg in EXAMPLES:
        path = os.path.join(REPO, "examples", cfg)
        if not os.path.exists(path):
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = run_one_config(path)
        out = normalize(buf.getvalue())
        dest = os.path.join(outdir, cfg.replace(".yml", ".txt"))
        with open(dest, "w") as f:
            f.write(out)
        print(f"{cfg}: rc={rc} -> {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
