"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10 — its only "state"
is the resume cache), so streaming here is an ENGINE capability, not
reference parity: the span-extraction stages are stateless and run
unchanged under ``readStream``; per-document assembly stays in
``foreachBatch`` (collect_list needs a batch boundary).
"""
