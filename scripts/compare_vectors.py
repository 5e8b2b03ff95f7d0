#!/usr/bin/env python3
"""SHA256 directory-vs-directory vector equality gate
(reference: scripts/compare_vectors.py, SEMANTIC_COMPATIBILITY.md:16-19)."""
import hashlib
import sys
from pathlib import Path


def checksums(d: Path) -> dict[str, str]:
    out = {}
    for p in sorted(d.glob("*")):
        if p.is_file() and p.name != "manifest.json":
            out[p.name] = hashlib.sha256(p.read_bytes()).hexdigest()
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print("usage: compare_vectors.py <dir_a> <dir_b>")
        return 1
    a, b = checksums(Path(sys.argv[1])), checksums(Path(sys.argv[2]))
    bad = False
    for name in sorted(set(a) | set(b)):
        if name not in a or name not in b:
            print(f"MISSING  {name}: only in {'b' if name not in a else 'a'}")
            bad = True
        elif a[name] != b[name]:
            print(f"DIFFER   {name}")
            bad = True
        else:
            print(f"match    {name}")
    return 2 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
