"""Corpus sources: CoNLL-2003 / CoNLL-U readers, Watson response parsers.

Each source produces the canonical corpus DataFrame shape
(``fold, doc_id, token_idx, span, …``, FIXTURES.md §2) so every operator
downstream composes without adapters.
"""
