"""Regenerate catalog/__init__.py's _DRIVER_ATTESTED from the union of
hash-green rows across all CORRECTNESS_r*.json artifacts.

Run after each round: ``python scripts/attested.py`` rewrites the
frozenset literal in place so the driver-sample rotation submits
never-attested entries first.
"""

import glob
import json
import re

REPO = "/root/repo"


def green_names() -> list[str]:
    greens: set[str] = set()
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        data = json.load(open(path))
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                greens.add(name)
    return sorted(greens)


def main() -> None:
    names = green_names()
    body, line = "", "    "
    for n in names:
        tok = f'"{n}", '
        if len(line) + len(tok) > 78:
            body += line.rstrip() + "\n"
            line = "    "
        line += tok
    body += line.rstrip().rstrip(",") + ",\n"
    target = f"{REPO}/backend_etl_spark/catalog/__init__.py"
    src = open(target).read()
    new = re.sub(
        r"_DRIVER_ATTESTED = frozenset\(\{.*?\}\)",
        "_DRIVER_ATTESTED = frozenset({\n" + body + "})",
        src,
        flags=re.S,
    )
    open(target, "w").write(new)
    print(f"{len(names)} attested names written to {target}")


if __name__ == "__main__":
    main()
