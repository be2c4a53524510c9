"""Test oracle: a single-threaded py3 port of the reference's crawl
semantics.  Used ONLY in tests to assert the distributed engine's
byte-identity (never on the hot path)."""
