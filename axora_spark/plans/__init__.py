"""Crawl plans: the wave-loop BFS driver, lineage, resume."""
