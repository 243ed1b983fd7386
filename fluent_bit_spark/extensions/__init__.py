"""Large-scale training-data-pipeline extensions.

Beyond the reference's own operator surface (it is a telemetry agent), these
are the operations a 100 TB text/embedding corpus pipeline needs: exact and
near deduplication, similarity search over embeddings, text analysis, and
multimodal-column plumbing. All are built scale-first: shuffle on content
hashes / LSH buckets (uniformly distributed keys), broadcast only the
genuinely small sides, no driver-side loops.
"""
