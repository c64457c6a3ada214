"""Extract every python code block from the reference's docs into
/tmp/ref_doc_examples.json for tools/run_reference_doc_examples.py."""
import glob
import json
import os
import re

out = {}
for rst in glob.glob("/root/reference/docs/source/**/*.rst", recursive=True):
    text = open(rst).read()
    blocks = []
    for m in re.finditer(r"\.\. code-block:: python\n((?:\n|    .*\n)+)", text):
        body = "\n".join(line[4:] if line.startswith("    ") else line for line in m.group(1).splitlines())
        blocks.append(body.strip())
    if blocks:
        out[os.path.relpath(rst, "/root/reference/docs/source")] = blocks

for nb in glob.glob("/root/reference/docs/source/**/*.ipynb", recursive=True):
    cells = json.load(open(nb)).get("cells", [])
    blocks = ["".join(c["source"]) for c in cells if c["cell_type"] == "code" and "".join(c["source"]).strip()]
    if blocks:
        out[os.path.relpath(nb, "/root/reference/docs/source")] = blocks

json.dump(out, open("/tmp/ref_doc_examples.json", "w"), indent=1)
print(f"{len(out)} docs, {sum(len(v) for v in out.values())} blocks")
