"""Operator library: the engine's re-expression of the reference's
operator vocabulary (SURVEY.md §2) as composable Ray Data transforms.

Modules:
  predicates  - Switch's 12-operator predicate algebra (switch.py:90-129)
  relational  - joins / grouped aggregates / top-k / distinct / union
  text        - language-ID, quality scoring, token counts, fingerprints
  dedup       - exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  incremental - near-dup of NEW batches vs a persisted band index
                (continuous-crawl; corpus never re-read)
  similarity  - cosine top-k (brute force + LSH-bucketed)
  cluster     - distributed k-means (streaming partial-sum Lloyd) and
                SemDeDup-style semantic dedup over the k-means cells
  linkgraph   - href extraction off binary html, weighted host-graph
                edges, integer fixed-point PageRank (late r05)
  lm          - corpus-fit bigram-LM perplexity scoring (CCNet-style
                quality signal, integer fixed-point; late r05)
  drift       - per-token log-odds drift between two corpora (crawl
                QA report, integer fixed-point; late r05)
  validate    - declarative data-expectation gates (not_null/unique/
                range/regex/in_set violation report; late r05)
  window      - event-time tumbling windows, sessionization, as-of join,
                LLM sequence packing
  template    - per-row template rendering (template.py:70-139)
  sketch      - HyperLogLog NDV, histogram quantiles, heavy hitters
  code_exec   - sandboxed-subprocess Code component + in-process UDFs
  retrieval   - hybrid keyword+vector top-k, citation insertion
  sql_exec    - ExeSQL extract + execute + bounded repair loop
  sampling    - deterministic hash sampling
"""
