"""Expression kits: pure functions returning Columns — zero UDFs.

- ``scalars``: the reference's scalar surface (SURVEY.md §2.8 F1-F20).
- ``text``: tokenization / language-ID / quality / fingerprint expressions.
- ``vectors``: dense-vector math over array<float> columns.
"""

from . import scalars, text, vectors  # noqa: F401
