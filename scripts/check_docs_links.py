"""Fail if any docs page links to a nonexistent local file."""
import os
import re
import sys

bad = []
for root, _, files in os.walk("docs"):
    for f in files:
        if not f.endswith(".md"):
            continue
        text = open(os.path.join(root, f)).read()
        for m in re.finditer(r"\]\((?!https?://|#)([^)]+)\)", text):
            target = os.path.normpath(os.path.join(root, m.group(1)))
            if not os.path.exists(target):
                bad.append(f"{f}: {m.group(1)}")
if bad:
    print("\n".join(bad))
    sys.exit(1)
print("docs links OK")
