"""Source connectors and readers (SURVEY.md §2.4).

The reference's 17 web/API connectors share one shape: query string in,
top-N rows out, errors IN-BAND as rows (baidu.py:70-71). The engine
keeps the shape — a ``status`` column instead of **ERROR** strings —
and makes the network transport pluggable: the default offline backend
is deterministic (no network exists in this environment); a real
deployment plugs an HTTP transport into the same seam.
"""
