"""Stateful building blocks: approximate-membership filters, the
sharded URL-seen set, and the politeness clock."""
