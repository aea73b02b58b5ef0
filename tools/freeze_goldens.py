"""Regenerate tests/goldens/corpus_goldens.json from the pure extractor.

ONLY run this deliberately, when extraction semantics or the corpus
generator change on purpose (CLAUDE.md invariant) — and say so in the
commit message.  Usage: python tools/freeze_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docvault_ocr_service_spark import corpus  # noqa: E402
from docvault_ocr_service_spark.extract import extract_document  # noqa: E402

N_ROWS = 120

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "corpus_goldens.json")


def main() -> None:
    rows = {}
    full_text = {}
    seen_templates: set[str] = set()
    for i in range(N_ROWS):
        row = corpus.generate_row(i)
        template = corpus.template_for(i)
        res = extract_document(row["url"], row["html"], row["text"],
                               row["lang"])
        rows[row["url"]] = {
            "row": i,
            "template": template,
            "status": res["status"],
            "error_kind": res["error_kind"],
            "category": res["category"],
            "page_count": res["page_count"],
            "n_spans": len(res["spans"]),
            "text_sha256": (hashlib.sha256(res["text"].encode()).hexdigest()
                            if res["text"] is not None else None),
            "md_confidence": (res["metadata"]["confidence"]
                              if res["metadata"] is not None else None),
        }
        if template not in seen_templates:
            seen_templates.add(template)
            full_text[row["url"]] = res["text"]

    payload = {
        "corpus_fingerprint": corpus.fingerprint(N_ROWS),
        "full_text": full_text,
        "rows": rows,
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True, ensure_ascii=False)
        f.write("\n")
    print(f"froze {len(rows)} rows, {len(full_text)} full-text samples, "
          f"fingerprint {payload['corpus_fingerprint'][:12]}…")


if __name__ == "__main__":
    main()
