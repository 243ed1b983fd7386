"""Large-scale training-data-pipeline extensions.

Beyond the reference's own operator surface (it is a telemetry agent), these
are the operations a 100 TB text/embedding corpus pipeline needs — the full
crawl-to-training-set chain: WARC/HTML extraction and robots compliance
(html, urls), URL hygiene and per-domain quotas (urls, mixing), exact /
MinHash / SimHash / semantic deduplication with incremental history and
transitive clusters (dedup, graph), quality filtering (Gopher rules,
unigram+bigram LM, CCNet perplexity buckets, C4, repetition and span-dup
screens — text), data selection (dsir), decontamination (decontam),
similarity search over embeddings plus lexical BM25 (similarity,
retrieval), tokenization (bpe), chunking/packing, dataset profiling and
sketch aggregates (sketches), graph authority (graph), time-series,
anomaly, TDA, ML inference, and multimodal-column plumbing. All are built
scale-first: shuffle on content hashes / LSH buckets (uniformly
distributed keys), broadcast only the genuinely small sides, no
driver-side loops.
"""
