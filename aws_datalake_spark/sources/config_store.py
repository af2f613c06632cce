"""JSON-file config store (SURVEY.md S18/S19).

Stand-in for the reference's DynamoDB config tables
(ingestion.py:236-237 get_data_from_dynamodb / ingestion.py:44-57
update_item): a directory of ``<table>/<source>.json`` documents.
Supports the schema-drift write-back — appending newly-seen columns
to a list attribute — with atomic replace so concurrent readers
never see a torn file.
"""

from __future__ import annotations

import json
import os
import tempfile


class ConfigStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str, source: str) -> str:
        return os.path.join(self.root, table, f"{source}.json")

    def get(self, table: str, source: str) -> dict:
        """S18 — config read (ingestion.py:236-237)."""
        with open(self._path(table, source)) as f:
            return json.load(f)

    def put(self, table: str, source: str, doc: dict) -> None:
        path = self._path(table, source)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f, indent=2, sort_keys=True)
        os.replace(tmp, path)

    def append_to_list(self, table: str, source: str, attr: str, values: list) -> dict:
        """S19 — drift write-back (ingestion.py:44-57: update_item
        list_append of newly-seen report columns)."""
        doc = self.get(table, source)
        existing = doc.get(attr, [])
        doc[attr] = existing + [v for v in values if v not in existing]
        self.put(table, source, doc)
        return doc
