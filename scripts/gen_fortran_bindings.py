#!/usr/bin/env python
"""Regenerate the Fortran ISO-C interface block from the C header.

Parses native/include/HYPREDRV_tpu.h and rewrites the AUTO-GENERATED
section of interfaces/fortran/src/hypredrive_tpu.f90 so the module
always covers the full C surface (the reference's Fortran module
mirrors every HYPREDRV verb; ref interfaces/fortran/src/hypredrive.f90).
Hand-written bindings above the marker are preserved; any C function
they already bind is skipped here.

Usage:  python scripts/gen_fortran_bindings.py [--check]
  --check: exit 1 if the generated section is stale (CI guard).
"""

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADER = os.path.join(REPO, "native", "include", "HYPREDRV_tpu.h")
F90 = os.path.join(REPO, "interfaces", "fortran", "src",
                   "hypredrive_tpu.f90")
MARK = "    ! == AUTO-GENERATED from HYPREDRV_tpu.h"
ENDMARK = "    ! == END AUTO-GENERATED"

# C type -> (fortran decl template, imports)
TYPE_MAP = {
    "HYPREDRV_t": ("integer(c_int64_t), value :: {n}", {"c_int64_t"}),
    "HYPREDRV_t *": ("integer(c_int64_t), intent(inout) :: {n}",
                     {"c_int64_t"}),
    "const char *": ("character(kind=c_char), dimension(*) :: {n}",
                     {"c_char"}),
    "char *": ("character(kind=c_char), dimension(*) :: {n}", {"c_char"}),
    "int64_t": ("integer(c_int64_t), value :: {n}", {"c_int64_t"}),
    "int32_t": ("integer(c_int32_t), value :: {n}", {"c_int32_t"}),
    "int": ("integer(c_int), value :: {n}", {"c_int"}),
    "uint32_t": ("integer(c_int32_t), value :: {n}", {"c_int32_t"}),
    "double": ("real(c_double), value :: {n}", {"c_double"}),
    "const int64_t *": ("integer(c_int64_t), dimension(*) :: {n}",
                        {"c_int64_t"}),
    "int64_t *": ("integer(c_int64_t), dimension(*) :: {n}",
                  {"c_int64_t"}),
    "const int32_t *": ("integer(c_int32_t), dimension(*) :: {n}",
                        {"c_int32_t"}),
    "int32_t *": ("integer(c_int32_t), dimension(*) :: {n}",
                  {"c_int32_t"}),
    "const double *": ("real(c_double), dimension(*) :: {n}",
                       {"c_double"}),
    "double *": ("real(c_double), dimension(*) :: {n}", {"c_double"}),
    "void **": ("type(c_ptr), intent(inout) :: {n}", {"c_ptr"}),
    "const void *": ("type(c_ptr), value :: {n}", {"c_ptr"}),
    "void *": ("type(c_ptr), value :: {n}", {"c_ptr"}),
}


def parse_header():
    text = open(HEADER).read()
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    sigs = re.findall(
        r"\b(uint32_t|const char \*|int64_t)\s+(HYPREDRV_[A-Za-z0-9_]+)"
        r"\s*\(([^;]*?)\)\s*;", text, flags=re.S)
    out = []
    for ret, name, argstr in sigs:
        argstr = " ".join(argstr.split())
        if argstr in ("void", ""):
            out.append((ret, name, []))
            continue
        args = []
        ok = True
        for i, piece in enumerate(argstr.split(",")):
            piece = piece.strip()
            m = re.match(r"^(.*?)([A-Za-z_][A-Za-z0-9_]*)$", piece)
            if not m:
                ok = False
                break
            ctype = m.group(1).strip()
            aname = m.group(2)
            if ctype == "" and aname in ("HYPREDRV_t",):
                ctype, aname = aname, f"arg{i}"
            ctype = " ".join(ctype.split())
            ctype = ctype.replace("* ", "*").replace("*", " *").strip()
            ctype = " ".join(ctype.split())
            if ctype not in TYPE_MAP:
                ok = False
                break
            args.append((ctype, aname))
        if ok:
            out.append((ret, name, args))
        else:
            out.append((ret, name, None))   # unbindable, note it
    return out


def emit(sig):
    ret, name, args = sig
    if args is None:
        return (f"    ! {name}: signature not auto-bindable "
                "(bind manually if needed)\n")
    imports = {"c_int32_t"} if ret == "uint32_t" else set()
    if ret == "const char *":
        imports = {"c_ptr"}
    decls = []
    for ctype, aname in args:
        tpl, imp = TYPE_MAP[ctype]
        decls.append("      " + tpl.format(n=aname))
        imports |= imp
    argnames = ", ".join(a for _, a in args)
    res = "rc" if ret == "uint32_t" else "ptr"
    res_decl = ("      integer(c_int32_t) :: rc" if ret == "uint32_t"
                else "      type(c_ptr) :: ptr")
    lines = [f"    function {name}({argnames}) &",
             f'        bind(c, name="{name}") result({res})',
             f"      import :: {', '.join(sorted(imports))}"]
    lines += decls
    lines.append(res_decl)
    lines.append("    end function")
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    f90 = open(F90).read()
    bound = set(re.findall(r'bind\s*\(\s*c\s*,\s*name\s*=\s*"([^"]+)"',
                           f90.split(MARK)[0], flags=re.I))
    sigs = [s for s in parse_header() if s[1] not in bound]
    body = MARK + " (scripts/gen_fortran_bindings.py) ==\n\n"
    body += "\n".join(emit(s) for s in sigs)
    body += ENDMARK + " ==\n"

    if MARK in f90:
        pre = f90.split(MARK)[0]
        post = f90.split(ENDMARK, 1)
        tail = post[1].split("\n", 1)[1] if len(post) > 1 else \
            "\n  end interface\n\nend module hypredrive_tpu\n"
        new = pre + body + tail
    else:
        # insert before 'end interface'
        idx = f90.rindex("  end interface")
        new = f90[:idx] + body + "\n" + f90[idx:]
    if args.check:
        if new != f90:
            print("fortran bindings are stale; run "
                  "scripts/gen_fortran_bindings.py", file=sys.stderr)
            return 1
        return 0
    open(F90, "w").write(new)
    n_auto = sum(1 for s in sigs if s[2] is not None)
    print(f"wrote {F90}: {len(bound)} hand-written + {n_auto} generated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
