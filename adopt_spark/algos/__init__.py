"""Graph algorithms: triangle/motif counting, PageRank, CC, LPA."""
