"""Write a meta-info file (one GT filename per line) for meta-file-paired
datasets (parity: reference scripts/data_preparation/generate_meta_info.py)."""

import os
import sys

if __name__ == "__main__":
    folder, out = sys.argv[1], sys.argv[2]
    names = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )
    with open(out, "w") as fh:
        fh.write("\n".join(names) + "\n")
    print(f"wrote {len(names)} entries to {out}")
