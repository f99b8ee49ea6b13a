"""Pure-Python kernels — no Spark imports allowed in this subpackage.

These are the single source of truth for row-level semantics: the pandas
UDFs in ``functions/`` and the golden-oracle simulator in ``simulator.py``
both call into here, so engine and oracle can never drift apart.
"""
