"""ztdf_spark — a from-scratch PySpark-native CDC ingest engine with the
data-processing capabilities of the ``opentdf/nifi`` reference processors
(ConvertToZTDF / ConvertFromZTDF / ConvertToNanoTDF / ConvertFromNanoTDF +
SimpleOpenTDFControllerService), re-expressed Spark-first:

- ``settings``   — engine configuration (analog of the NiFi controller
                   service, reference ``SimpleOpenTDFControllerService.java``)
- ``tdf``        — pure-Python TDF-style envelope crypto core (ZTDF + Nano),
                   deterministic nonces, local KAS emulation via AES-KEK wrap;
                   frame (compact, default) and spec-shaped ZIP containers
- ``container``  — deterministic stored-only ZIP writer/reader for the
                   public OpenTDF on-disk layout (0.payload + 0.manifest.json)
- ``rsakas``     — deterministic per-KAS RSA-2048 keys + real RSA-OAEP(SHA-1)
                   DEK wrap (the SDK's keyAccess wrappedKey shape,
                   ``wrap_mode="rsa-oaep"``), PEM-exportable for a real KAS
- ``ops``        — vectorized Arrow/pandas-UDF operator layer + Catalyst-side
                   routing (success / failure / exceeds_size_limit)
- ``el``         — NiFi expression-language analog: property templates
                   compiled once into Catalyst Column expressions (reference
                   ``AbstractTDFProcessor.java:113-115``)
- ``lake``       — minimal Iceberg-v2-semantics table format over Parquet
                   (atomic snapshot commits, COW + merge-on-read MERGE,
                   additive schema evolution + type widening + metadata-only
                   rename/drop/re-add (stable physical names), time travel,
                   batch-id fencing, incremental change feed, compaction /
                   retention / vacuum, snapshot rollback, predicate
                   delete_where, named refs: tags + branches with
                   write-audit-publish)
- ``pipeline``   — Structured Streaming binlog tail → dedup → encrypt →
                   MERGE → audit/lineage, exactly-once, checkpoint-resumable
- ``source``     — the lake AS a Structured Streaming source AND sink
                   (``format('ztdf_lake')``): snapshot-version offsets,
                   per-delta-file partitions, Arrow-batch executor
                   reads/writes, epoch-fenced exactly-once commits
                   (Spark 4 Python Data Source API)
- ``datagen``    — deterministic synthetic binlog / tokens generators
- ``textops``    — training-data text pipeline (dedup exact/minhash/simhash,
                   n-gram jaccard, connected-components near-dup clustering,
                   eval-set decontamination, deterministic mixture sampling,
                   language-id, quality, token count, fingerprint) over the
                   ``documents`` table
- ``simops``     — embedding similarity search (brute-force cosine top-k,
                   LSH / sign-bit / IVF / product-quantization ANN, exact +
                   LSH embedding near-dup) over the ``embeddings`` table
- ``tokops``     — GPT-style concat-and-chunk sequence packing into fixed
                   context windows (two-level distributed prefix sum, no
                   single-partition funnel; spans + materialized chunks)
- ``bpeops``     — distributed BPE vocabulary training (one corpus-sized
                   shuffle, per-merge rounds over the distinct-word table,
                   Catalyst fold merge application) + Arrow-batched
                   tokenization with the learned merges
- ``stream_ops`` — watermarked windowed aggregation (batch ≡ stream),
                   applyInPandasWithState sessionizer, one-shuffle as-of join
- ``mmops``      — multimodal binary columns: real pure-Python decoders
                   (WAV incl. G.711/ADPCM via ``audio``, PPM, BMP,
                   baseline+progressive JPEG via ``jpeg``, plain+Adam7
                   PNG via ``png``, GIF via ``gif``, Y4M and AVI/MJPEG
                   via ``avi`` video), features / resize / frame
                   sampling over mapInPandas
- ``nano``       — spec-shaped NanoTDF binary container (L1L, real ECDH +
                   HKDF payload key, GMAC or deterministic-ECDSA binding)
- ``bloom``      — opt-in per-delta-file key Bloom filters for point-lookup
                   file skipping at the manifest layer
- ``unigram``    — unigram-LM (SentencePiece-model) subword tokenizer,
                   hard-EM over the distinct-word table with exact-rational
                   Viterbi (big-int cross-multiplication, no log-floats) —
                   the shrinking counterpart to ``bpeops``' growing vocab
- ``wordpiece``  — WordPiece (BERT) subword tokenizer: likelihood-rule
                   merges count(l,r)/(count(l)·count(r)) selected exactly
                   (float-band prefilter + big-int cross-multiplication),
                   map-only MaxMatch encode with whole-word [UNK]
- ``quantiles``  — exact order-statistic percentiles with NO global sort:
                   histogram-refinement selection (Munro-Paterson rounds)
                   as partial-combine counting aggregates with parquet
                   range pruning on the later passes
- ``mlops``      — integer-exact hashed linear text classifier (the
                   fastText/CCNet-style corpus quality filter): distributed
                   full-batch logistic regression whose cross-partition math
                   is all int64 (bit-identical under any layout), literal-
                   weight pure-Catalyst scoring
"""

__version__ = "0.1.0"
