"""Stateful components: URL-seen set (exact/bloom shards), politeness."""
