#!/usr/bin/env python
"""Check build/test source lists stay in sync with the tree.

Equivalent of the reference's scripts/check_source_sync.py (CMake
source-list vs directory): here the checks are

  1. every ``native/src/*.cpp`` is compiled by ``native/Makefile``;
  2. every module under ``hypredrive_tpu/`` is imported by the package
     or the test suite (no orphan modules silently falling out of
     coverage);
  3. every ``examples/*.yml`` is referenced by a test or PARITY report.

Exit non-zero on any desync so CI can gate on it.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fail(msgs, what):
    for m in msgs:
        print(f"FAIL ({what}): {m}")
    return 1 if msgs else 0


def check_native() -> int:
    mk = open(os.path.join(REPO, "native", "Makefile")).read()
    missing = [f for f in sorted(os.listdir(os.path.join(REPO, "native", "src")))
               if f.endswith(".cpp") and f not in mk]
    return fail(missing, "native/Makefile does not compile")


def check_modules() -> int:
    pkg = os.path.join(REPO, "hypredrive_tpu")
    mods = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py") and f != "__init__.py":
                rel = os.path.relpath(os.path.join(root, f), REPO)
                mod = rel[:-3].replace(os.sep, ".")
                mods.append(mod)
    hay = []
    for d in (pkg, os.path.join(REPO, "tests")):
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".py"):
                    hay.append(open(os.path.join(root, f)).read())
    hay = "\n".join(hay)
    missing = []
    for mod in mods:
        leaf = mod.rsplit(".", 1)[-1]
        if not re.search(rf"\b{re.escape(leaf)}\b", hay.replace(mod, leaf)):
            missing.append(mod)
    return fail(missing, "module never imported by package or tests")


def check_examples() -> int:
    hay = []
    for d in (os.path.join(REPO, "tests"), os.path.join(REPO, "scripts")):
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith((".py", ".sh")):
                    hay.append(open(os.path.join(root, f)).read())
    hay.append(open(os.path.join(REPO, "PARITY.md")).read())
    # include: directives make a YAML referenced through its includer
    exdir0 = os.path.join(REPO, "examples")
    for f in os.listdir(exdir0):
        if f.endswith(".yml"):
            hay.append(open(os.path.join(exdir0, f)).read())
    hay = "\n".join(hay)
    exdir = os.path.join(REPO, "examples")
    missing = [f for f in sorted(os.listdir(exdir))
               if f.endswith(".yml") and f not in hay]
    return fail(missing, "example not referenced by tests/scripts/PARITY")


def main() -> int:
    status = check_native() | check_modules() | check_examples()
    if status == 0:
        print("source lists in sync")
    return status


if __name__ == "__main__":
    raise SystemExit(main())
