"""Model file integrity checks (scripts/verify-checksum-models.py analogue).

  python scripts/verify_checksums.py SHA256SUMS [base_dir]   # verify
  python scripts/verify_checksums.py --write out.sums f1 f2  # generate
"""

import hashlib
import sys
from pathlib import Path


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    return h.hexdigest()


def main(argv):
    if not argv:
        print(__doc__.strip())
        return 2
    if argv[0] == "--write":
        out = Path(argv[1])
        with open(out, "w") as f:
            for p in argv[2:]:
                f.write(f"{sha256(Path(p))}  {p}\n")
        print(f"wrote {out}")
        return 0
    sums = Path(argv[0])
    base = Path(argv[1]) if len(argv) > 1 else sums.parent
    ok = True
    for line in sums.read_text().splitlines():
        if not line.strip():
            continue
        digest, name = line.split(None, 1)
        path = base / name.strip()
        if not path.exists():
            print(f"MISSING  {name}")
            ok = False
            continue
        actual = sha256(path)
        status = "OK" if actual == digest.lower() else "FAILED"
        ok = ok and status == "OK"
        print(f"{status:7s}  {name}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
