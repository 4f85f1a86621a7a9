"""LLM-training-data pipeline operators (SURVEY.md §2.D).

No reference counterpart — Mrs predates LLM data work — but these are the
operators a Mrs-style user would hand-compose for corpus curation, built
here as first-class, 100 TB-ready DataFrame pipelines: deduplication
(exact / MinHash / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force and IVF-pruned), text analysis (language
ID, quality scoring, token counting, fingerprinting, tf-idf) and
multimodal binary columns.
"""
