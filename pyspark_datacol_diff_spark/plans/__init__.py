"""Plan-inspection helpers: assertions over explain() output used by tests
to pin physical properties (pushdown, broadcast, single-shuffle)."""
