"""Operator-level building blocks (SURVEY.md §2).

Each module re-expresses one family of reference semantics as pure
DataFrame transformations — no driver-side row loops, no per-row RPC:

* ``rules`` — config-driven projection compiler (P1-P3, P6)
* ``scalar`` — scalar/column hygiene ops (P8-P19)
* ``nested`` — flatten / explode / deep-get (E1-E4, P4, P5, P16)
* ``drift`` — schema reconciliation + config write-back (P15, S19)
* ``scd2`` — SCD Type-2 merge (J2, J3, A1)
* ``state_delta`` — cumulative→delta stateful computation (A3, J1, S20, S21)
* ``dq`` — data-quality expectations engine (A2, A4-A6, ST2, ST3)
* ``dedup`` / ``similarity`` / ``text`` / ``multimodal`` — LLM-data-
  pipeline operators (north star, BASELINE.json)
"""
