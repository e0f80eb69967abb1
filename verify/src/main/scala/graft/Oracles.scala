package graft

/** DuckDB oracle SQL, one entry per SparkEntry.queries key.
  *
  * Parity rules (see graft.queries.Parity): money aggregates via
  * DECIMAL(18,2) then CAST AS DOUBLE; integer sums CAST AS BIGINT (DuckDB
  * sums INTEGER into HUGEINT); explicit ORDER BY with a unique tiebreak;
  * timestamps surfaced as epoch_us BIGINT.
  */
object Oracles {
  /** q67 (large-star/small-star CC) must reproduce q54's cluster view
    * exactly, so it shares q54's recursive-CTE oracle verbatim. */
  val sql: Map[String, String] =
    base + ("q67_dup_clusters_bigstar" -> base("q54_dup_clusters"))

  private lazy val base: Map[String, String] = Map(
    // q382: the engine really encodes, DECODES (ImageIO) and dHashes PNG
    // rasters; the oracle replays the full planted arithmetic — sampled
    // pixel values, 1-bit perturbation, integer grayscale, dHash bits,
    // 4x16-bit band keys, candidate join, Hamming verify — so equality
    // proves real codec + perceptual-hash work ran end-to-end
    "q382_phash_dedup" ->
      s"""WITH ${Oracles.phashPairCtes}
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM ham WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin,

    // q383: q382's arithmetically replayed pairs closed into connected
    // components (the q54 recursive-CTE discipline) — one representative
    // (min id) per visually-near-duplicate image family
    "q383_phash_clusters" ->
      s"""WITH RECURSIVE ${Oracles.phashPairCtes},
        |pairs AS (SELECT id_a, id_b FROM ham WHERE hamming <= 6),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT doc.doc_id, COALESCE(c.comp, doc.doc_id) AS cluster_id
        |  FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        |)
        |SELECT doc_id, cluster_id,
        |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |  doc_id = cluster_id AS keep
        |FROM allc ORDER BY doc_id""".stripMargin,

    // q393: the engine really encodes multi-frame GIFs, decodes each
    // frame (ImageIO frame iterator) and per-frame dHashes the rasters;
    // the oracle replays the full planted arithmetic per frame — rasters,
    // one-frame perturbation, grayscale, dHash bits, per-frame band keys,
    // cap, aligned-frame Hamming, the 4/5-close integer threshold — so
    // equality proves real multi-frame codec + temporal fingerprint work
    "q393_video_neardup_pairs" ->
      s"""WITH ${Oracles.videoPairCtes}
        |SELECT id_a, id_b, n_close, n_total FROM vp
        |ORDER BY id_a, id_b""".stripMargin,

    // q394: q393's temporally verified pairs closed into connected
    // components (the q54 recursive-CTE discipline) — one representative
    // per near-duplicate clip family
    "q394_video_clusters" ->
      s"""WITH RECURSIVE ${Oracles.videoPairCtes},
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM vp
        |  UNION SELECT id_b, id_a FROM vp
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT doc.doc_id, COALESCE(c.comp, doc.doc_id) AS cluster_id
        |  FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        |)
        |SELECT doc_id, cluster_id,
        |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |  doc_id = cluster_id AS keep
        |FROM allc ORDER BY doc_id""".stripMargin,

    // q386: semantic image clusters from PIXELS — the oracle replays the
    // planted raster arithmetic (4×4 sampled integer luma, exact-integer
    // mean centering), the SAME inlined hyperplane band keys the engine
    // uses (LshAnn.sqlBandKeys), the bucket cap, the left-to-right
    // float64 cosine, and the recursive-CTE component closure — equality
    // proves real decode → embed → LSH → CC work ran end-to-end
    "q386_image_semantic_clusters" ->
      s"""WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id // 2 AS grp, doc_id % 2 AS p,
        |    16 + (doc_id // 2) % 17 AS w, 16 + (doc_id // 2) % 13 AS h
        |  FROM documents),
        |g AS (SELECT k, k % 4 AS i, k // 4 AS j FROM range(16) t(k)),
        |px AS (
        |  SELECT d.doc_id, d.grp, d.p, g.k,
        |    (g.i * d.w) // 4 AS x, (g.j * d.h) // 4 AS y
        |  FROM d, g),
        |tt AS (
        |  SELECT doc_id, p, k, x, y,
        |    ((grp * 2654435761 + x * 31 + y * 131) % 16777213)
        |      * ((grp * 2654435761 + x * 31 + y * 131) % 16777213)
        |      % 16777213 AS base
        |  FROM px),
        |pix AS (
        |  SELECT doc_id, k,
        |    CASE WHEN p = 1 AND (x + y) % 2 = 0
        |      THEN xor(base, 65793) ELSE base END AS v
        |  FROM tt),
        |gray AS (
        |  SELECT doc_id, k,
        |    (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
        |      + (v & 255) * 114) // 1000 AS gy
        |  FROM pix),
        |cent AS (
        |  SELECT doc_id, k,
        |    16 * gy - SUM(gy) OVER (PARTITION BY doc_id) AS e
        |  FROM gray),
        |vec AS (
        |  SELECT doc_id, list(CAST(e AS DOUBLE) ORDER BY k) AS v
        |  FROM cent GROUP BY doc_id HAVING SUM(e * e) > 0),
        |bands AS (
        |  SELECT doc_id, unnest([
        |    ${graft.similarity.LshAnn.sqlBandKeys("v", nTables = 4, nBits = 12, dim = 16, seed = 42L).mkString(",\n    ")}
        |  ]) AS bkey FROM vec),
        |bsz AS (SELECT bkey FROM bands GROUP BY bkey HAVING COUNT(*) <= 200),
        |capped AS (SELECT b.* FROM bands b JOIN bsz USING (bkey)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM capped a JOIN capped b
        |    ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |cos AS (
        |  SELECT c.id_a, c.id_b FROM cand c
        |  JOIN vec va ON va.doc_id = c.id_a
        |  JOIN vec vb ON vb.doc_id = c.id_b
        |  WHERE list_dot_product(va.v, vb.v)
        |    / (sqrt(list_dot_product(va.v, va.v))
        |       * sqrt(list_dot_product(vb.v, vb.v))) >= 0.95),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM cos
        |  UNION SELECT id_b, id_a FROM cos
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT doc.doc_id, COALESCE(c.comp, doc.doc_id) AS cluster_id
        |  FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        |)
        |SELECT doc_id, cluster_id,
        |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |  doc_id = cluster_id AS keep
        |FROM allc ORDER BY doc_id""".stripMargin,

    // q387: semantic audio clusters from SAMPLES — the q386 replay
    // discipline over the planted PCM arithmetic: window energies,
    // exact-integer mean centering, the same inlined hyperplane band
    // keys, bucket cap, float64 cosine, recursive-CTE closure
    "q387_audio_semantic_clusters" ->
      s"""WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id // 2 AS grp, doc_id % 2 AS p,
        |    64 + (doc_id // 2) % 53 AS n
        |  FROM documents),
        |s AS (SELECT doc_id, grp, p, n, unnest(range(n)) AS t FROM d),
        |sv AS (
        |  SELECT doc_id, n, t,
        |    ((grp * 2654435761 + t * 9176) % 16777213)
        |      * ((grp * 2654435761 + t * 9176) % 16777213)
        |      % 65533 - 32766
        |      + CASE WHEN p = 1 AND t % 2 = 0 THEN 1 ELSE 0 END AS v
        |  FROM s),
        |win AS (
        |  SELECT doc_id, (t * 33) // n AS w, SUM(v * v) AS e
        |  FROM sv GROUP BY 1, 2),
        |cent AS (
        |  SELECT doc_id, w,
        |    33 * e - SUM(e) OVER (PARTITION BY doc_id) AS ec
        |  FROM win),
        |vec AS (
        |  SELECT doc_id, list(CAST(ec AS DOUBLE) ORDER BY w) AS v
        |  FROM cent GROUP BY doc_id HAVING SUM(ec * ec) > 0),
        |bands AS (
        |  SELECT doc_id, unnest([
        |    ${graft.similarity.LshAnn.sqlBandKeys("v", nTables = 4, nBits = 12, dim = 33, seed = 42L).mkString(",\n    ")}
        |  ]) AS bkey FROM vec),
        |bsz AS (SELECT bkey FROM bands GROUP BY bkey HAVING COUNT(*) <= 200),
        |capped AS (SELECT b.* FROM bands b JOIN bsz USING (bkey)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM capped a JOIN capped b
        |    ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |cos AS (
        |  SELECT c.id_a, c.id_b FROM cand c
        |  JOIN vec va ON va.doc_id = c.id_a
        |  JOIN vec vb ON vb.doc_id = c.id_b
        |  WHERE list_dot_product(va.v, vb.v)
        |    / (sqrt(list_dot_product(va.v, va.v))
        |       * sqrt(list_dot_product(vb.v, vb.v))) >= 0.985),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM cos
        |  UNION SELECT id_b, id_a FROM cos
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT doc.doc_id, COALESCE(c.comp, doc.doc_id) AS cluster_id
        |  FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        |)
        |SELECT doc_id, cluster_id,
        |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |  doc_id = cluster_id AS keep
        |FROM allc ORDER BY doc_id""".stripMargin,

    // q388: the Viterbi E-step replays as a recursive CTE advancing one
    // position per step with a lateral (cost, seg) min — the q367
    // recursive-replay discipline; costs are round(ln,9) DECIMALs so the
    // DP folds exactly in both engines
    "q388_unigram_em" ->
      s"""WITH RECURSIVE ${Oracles.unigramTrainCtes("TRUE")},
        |${Oracles.unigramDpCtes("words", "vocab")},
        |m AS (
        |  SELECT unnest(string_split(seg, '|')) AS piece, freq FROM fin
        |), em AS (
        |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS em_mass,
        |    CAST(COUNT(*) AS BIGINT) AS n_words
        |  FROM m GROUP BY piece
        |), emtot AS (SELECT CAST(SUM(em_mass) AS BIGINT) AS t1 FROM em)
        |SELECT e.piece, v.seed_mass, e.em_mass, e.n_words,
        |  round(ln(CAST(t.t1 AS DOUBLE)) - ln(CAST(e.em_mass AS DOUBLE)),
        |    6) AS nll
        |FROM em e JOIN vocab v ON v.piece = e.piece, emtot t
        |ORDER BY e.em_mass DESC, e.piece LIMIT 30""".stripMargin,

    // q389: q388's trainer on the <800-bucket split, Viterbi-applied to
    // held-out words with unseen chars entering as mass-1 unk pieces;
    // fertility/unk per language
    "q389_unigram_fertility" ->
      s"""WITH RECURSIVE ${Oracles.unigramTrainCtes(
            "(CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT)" +
            " % 2305843009213693951) % 1000 < 800")},
        |hnorm AS (
        |  SELECT lang, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^\\p{L}\\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents
        |  WHERE (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT)
        |    % 2305843009213693951) % 1000 >= 800
        |), htok AS (
        |  SELECT lang, unnest(string_split(t, ' ')) AS w FROM hnorm
        |), hlang AS (
        |  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS freq FROM htok
        |  WHERE length(w) BETWEEN 1 AND 16 GROUP BY 1, 2
        |), hwords AS (
        |  SELECT w, CAST(SUM(freq) AS BIGINT) AS freq FROM hlang GROUP BY w
        |), unk AS (
        |  SELECT u.piece,
        |    CAST(round(ln(CAST(t.t AS DOUBLE)) - ln(CAST(1 AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS cost, TRUE AS is_unk
        |  FROM (
        |    SELECT DISTINCT substr(h.w, CAST(p.i AS INTEGER), 1) AS piece
        |    FROM hwords h, unnest(generate_series(1, length(h.w))) AS p(i)
        |  ) u, tot t
        |  WHERE u.piece NOT IN (SELECT piece FROM vocab)
        |), fullvocab AS (
        |  SELECT piece, cost, FALSE AS is_unk FROM vocab
        |  UNION ALL SELECT piece, cost, is_unk FROM unk
        |),
        |${Oracles.unigramDpCtes("hwords", "fullvocab")},
        |pw AS (
        |  SELECT f.w, s.piece
        |  FROM fin f, unnest(string_split(f.seg, '|')) AS s(piece)
        |), perword AS (
        |  SELECT pw.w, CAST(COUNT(*) AS BIGINT) AS n_pieces_w,
        |    CAST(SUM(CASE WHEN v.is_unk THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_unk_w
        |  FROM pw JOIN fullvocab v ON v.piece = pw.piece
        |  GROUP BY pw.w
        |)
        |SELECT hl.lang, CAST(SUM(hl.freq) AS BIGINT) AS n_tokens,
        |  CAST(SUM(hl.freq * p.n_pieces_w) AS BIGINT) AS n_pieces,
        |  CAST(SUM(hl.freq * p.n_unk_w) AS BIGINT) AS n_unk_pieces,
        |  round(CAST(SUM(hl.freq * p.n_pieces_w) AS DOUBLE)
        |    / CAST(SUM(hl.freq) AS DOUBLE), 6) AS fertility
        |FROM hlang hl JOIN perword p ON p.w = hl.w
        |GROUP BY hl.lang ORDER BY hl.lang""".stripMargin,

    // q395: three chained Viterbi-EM rounds replayed end-to-end — the
    // seed-vocab CTEs, then per round the full DP (recursive CTE +
    // lateral min), the M-step renormalization (with the alphabet
    // mass-1 floor), and between rounds 2→3 the bottom-16 multi-char
    // prune; corpus NLL is the exact-DECIMAL Σ freq×best-cost rounded
    // once, and the monotone flag spans exactly the pure EM step
    "q395_unigram_em_rounds" ->
      s"""WITH RECURSIVE ${Oracles.unigramTrainCtes("TRUE")},
        |v1 AS MATERIALIZED (SELECT piece, seed_mass AS em_mass, cost FROM vocab),
        |${Oracles.unigramDpCtes("words", "v1", "1")},
        |${Oracles.unigramMStepCtes("fin1", "v1", "1", "v2")},
        |${Oracles.unigramDpCtes("words", "v2", "2")},
        |${Oracles.unigramMStepCtes("fin2", "v2", "2", "v3raw")},
        |drop3 AS (
        |  SELECT piece FROM v3raw WHERE length(piece) >= 2
        |  ORDER BY em_mass, piece LIMIT 16),
        |kept3 AS MATERIALIZED (
        |  SELECT * FROM v3raw
        |  WHERE piece NOT IN (SELECT piece FROM drop3)),
        |t3 AS (SELECT SUM(em_mass) AS t FROM kept3),
        |v3 AS MATERIALIZED (
        |  SELECT k.piece, k.em_mass,
        |    CAST(round(ln(CAST(t.t AS DOUBLE)) - ln(CAST(k.em_mass AS DOUBLE)),
        |      9) AS DECIMAL(20,9)) AS cost
        |  FROM kept3 k, t3 t),
        |${Oracles.unigramDpCtes("words", "v3", "3")},
        |rows AS (
        |  SELECT CAST(1 AS BIGINT) AS round,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM v1) AS vocab_size,
        |    CAST(0 AS BIGINT) AS n_pruned,
        |    CAST(COUNT(*) AS BIGINT) AS words_segmented,
        |    CAST(round(SUM(CAST(freq AS DECIMAL(10,0)) * cost), 6)
        |      AS DOUBLE) AS corpus_nll
        |  FROM fin1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM v2),
        |    CAST(0 AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |    CAST(round(SUM(CAST(freq AS DECIMAL(10,0)) * cost), 6)
        |      AS DOUBLE)
        |  FROM fin2
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM v3),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM v3raw)
        |      - (SELECT CAST(COUNT(*) AS BIGINT) FROM v3),
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(round(SUM(CAST(freq AS DECIMAL(10,0)) * cost), 6)
        |      AS DOUBLE)
        |  FROM fin3)
        |SELECT round, vocab_size, n_pruned, words_segmented, corpus_nll,
        |  CASE WHEN round = 2
        |    THEN corpus_nll <= lag(corpus_nll) OVER (ORDER BY round)
        |    ELSE NULL END AS monotone_ok
        |FROM rows ORDER BY round""".stripMargin,

    // q396: the trimmed-clip replay — the q393 raster arithmetic with the
    // odd twin's first frame removed (its stored frame f replays the
    // original frame f+1) and one surviving frame retouched; candidates
    // on (band, bkey) with |Δ| ≤ 2 (frame index deliberately off the
    // key), per-shift aligned-frame Hamming verify against
    // greatest(na, nb) − |Δ|, arg-max by (n_close DESC, shift) — equality
    // proves the offset-tolerant machinery end-to-end
    "q396_video_shifted_pairs" ->
      s"""WITH ${Oracles.trimmedVideoPairCtes}
        |SELECT id_a, id_b, shift, n_close, n_total FROM scored
        |QUALIFY row_number() OVER (PARTITION BY id_a, id_b
        |  ORDER BY n_close DESC, shift) = 1
        |ORDER BY id_a, id_b""".stripMargin,

    // q398: q396's shift-tolerant pairs closed into connected components
    // (the q394/q54 recursive-CTE discipline) — one representative per
    // trimmed/re-cut clip family. Edges come from the full passing
    // (pair, shift) set (a pair is an edge iff SOME |Δ| ≤ 2 alignment
    // passes — identical pair set to the engine's arg-max output)
    "q398_video_shifted_clusters" ->
      s"""WITH RECURSIVE ${Oracles.trimmedVideoPairCtes},
        |edges AS (
        |  SELECT DISTINCT id_a AS a, id_b AS b FROM scored
        |  UNION SELECT DISTINCT id_b, id_a FROM scored
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT doc.doc_id, COALESCE(c.comp, doc.doc_id) AS cluster_id
        |  FROM documents doc LEFT JOIN comp c ON c.node = doc.doc_id
        |)
        |SELECT doc_id, cluster_id,
        |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |  doc_id = cluster_id AS keep
        |FROM allc ORDER BY doc_id""".stripMargin,

    // q397: the serving path — the q395 3-round trainer replayed on the
    // <800-bucket split (seed vocab, two chained Viterbi-EM rounds, the
    // bottom-16 prune), then a FOURTH chained DP segmenting the held-out
    // words under the frozen vocab (never-seen characters as mass-1 unk
    // pieces, the q389 discipline), rolled up per held-out document with
    // the piece string reassembled in token order
    "q397_unigram_encode" ->
      s"""WITH RECURSIVE ${Oracles.unigramTrainCtes(
            "(CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT)" +
            " % 2305843009213693951) % 1000 < 800")},
        |v1 AS MATERIALIZED (SELECT piece, seed_mass AS em_mass, cost FROM vocab),
        |${Oracles.unigramDpCtes("words", "v1", "1")},
        |${Oracles.unigramMStepCtes("fin1", "v1", "1", "v2")},
        |${Oracles.unigramDpCtes("words", "v2", "2")},
        |${Oracles.unigramMStepCtes("fin2", "v2", "2", "v3raw")},
        |drop3 AS (
        |  SELECT piece FROM v3raw WHERE length(piece) >= 2
        |  ORDER BY em_mass, piece LIMIT 16),
        |kept3 AS MATERIALIZED (
        |  SELECT * FROM v3raw
        |  WHERE piece NOT IN (SELECT piece FROM drop3)),
        |t3 AS (SELECT SUM(em_mass) AS t FROM kept3),
        |v3 AS MATERIALIZED (
        |  SELECT k.piece, k.em_mass,
        |    CAST(round(ln(CAST(t.t AS DOUBLE)) - ln(CAST(k.em_mass AS DOUBLE)),
        |      9) AS DECIMAL(20,9)) AS cost
        |  FROM kept3 k, t3 t),
        |hnorm AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^\\p{L}\\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')) AS t
        |  FROM documents
        |  WHERE (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT)
        |    % 2305843009213693951) % 1000 >= 800
        |), hsplit AS (
        |  SELECT doc_id, string_split(t, ' ') AS sp FROM hnorm
        |), htok AS (
        |  SELECT doc_id, CAST(p.i AS INTEGER) AS pos,
        |    sp[CAST(p.i AS INTEGER)] AS w
        |  FROM hsplit, unnest(generate_series(1, len(sp))) AS p(i)
        |  WHERE length(sp[CAST(p.i AS INTEGER)]) BETWEEN 1 AND 16
        |), hwords AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM htok GROUP BY w
        |), t3s AS (SELECT CAST(SUM(em_mass) AS BIGINT) AS t FROM v3),
        |unk AS (
        |  SELECT u.piece,
        |    CAST(round(ln(CAST(t.t AS DOUBLE)) - ln(CAST(1 AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS cost, TRUE AS is_unk
        |  FROM (
        |    SELECT DISTINCT substr(h.w, CAST(p.i AS INTEGER), 1) AS piece
        |    FROM hwords h, unnest(generate_series(1, length(h.w))) AS p(i)
        |  ) u, t3s t
        |  WHERE u.piece NOT IN (SELECT piece FROM v3)
        |), fullvocab AS (
        |  SELECT piece, cost, FALSE AS is_unk FROM v3
        |  UNION ALL SELECT piece, cost, is_unk FROM unk
        |),
        |${Oracles.unigramDpCtes("hwords", "fullvocab", "e")},
        |pw AS (
        |  SELECT f.w, s.piece
        |  FROM fine f, unnest(string_split(f.seg, '|')) AS s(piece)
        |), perword AS (
        |  SELECT pw.w, CAST(COUNT(*) AS BIGINT) AS n_pieces_w,
        |    CAST(SUM(CASE WHEN v.is_unk THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_unk_w
        |  FROM pw JOIN fullvocab v ON v.piece = pw.piece
        |  GROUP BY pw.w
        |)
        |SELECT h.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(p.n_pieces_w) AS BIGINT) AS n_pieces,
        |  CAST(SUM(p.n_unk_w) AS BIGINT) AS n_unk_pieces,
        |  CAST(round(SUM(f.cost), 6) AS DOUBLE) AS nll,
        |  string_agg(f.seg, ' ' ORDER BY h.pos) AS pieces
        |FROM htok h
        |JOIN fine f ON f.w = h.w
        |JOIN perword p ON p.w = h.w
        |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,

    // q391: both CART levels replay as value-domain prefix sums + the
    // same IEEE-double Gini argmin (division/addition are correctly
    // rounded in both engines — no libm in the ordering key)
    "q391_cart_tree" ->
      """WITH rows0 AS (
        |  SELECT CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        |      AS BIGINT) AS y,
        |    CAST(l_quantity AS BIGINT) AS f_qty,
        |    CAST(round(l_discount * 100) AS BIGINT) AS f_disc
        |  FROM lineitem
        |), cells1 AS (
        |  SELECT 'root' AS node, 'disc' AS feat, f_disc AS v, y FROM rows0
        |  UNION ALL
        |  SELECT 'root', 'qty', f_qty, y FROM rows0
        |), agg1 AS (
        |  SELECT node, feat, v, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS pos
        |  FROM cells1 GROUP BY 1, 2, 3
        |), cand1 AS (
        |  SELECT node, feat, v,
        |    CAST(SUM(n) OVER cum AS BIGINT) AS nl,
        |    CAST(SUM(pos) OVER cum AS BIGINT) AS posl,
        |    CAST(SUM(n) OVER al AS BIGINT) AS tn,
        |    CAST(SUM(pos) OVER al AS BIGINT) AS tp
        |  FROM agg1
        |  WINDOW cum AS (PARTITION BY node, feat ORDER BY v
        |    ROWS UNBOUNDED PRECEDING),
        |  al AS (PARTITION BY node, feat)
        |), best1 AS (
        |  SELECT node, feat, v,
        |    CAST(nl*nl - posl*posl - (nl-posl)*(nl-posl) AS DOUBLE)
        |      / CAST(nl AS DOUBLE)
        |    + CAST((tn-nl)*(tn-nl) - (tp-posl)*(tp-posl)
        |        - ((tn-nl)-(tp-posl))*((tn-nl)-(tp-posl)) AS DOUBLE)
        |      / CAST(tn-nl AS DOUBLE) AS g,
        |    tn, tp
        |  FROM cand1 WHERE nl > 0 AND tn - nl > 0
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY g, feat, v) = 1
        |), lvl1 AS (
        |  SELECT CASE WHEN (CASE WHEN b.feat = 'qty' THEN r.f_qty
        |      ELSE r.f_disc END) <= b.v THEN 'L' ELSE 'R' END AS node,
        |    r.y, r.f_qty, r.f_disc
        |  FROM rows0 r, best1 b
        |), cells2 AS (
        |  SELECT node, 'disc' AS feat, f_disc AS v, y FROM lvl1
        |  UNION ALL
        |  SELECT node, 'qty', f_qty, y FROM lvl1
        |), agg2 AS (
        |  SELECT node, feat, v, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS pos
        |  FROM cells2 GROUP BY 1, 2, 3
        |), cand2 AS (
        |  SELECT node, feat, v,
        |    CAST(SUM(n) OVER cum AS BIGINT) AS nl,
        |    CAST(SUM(pos) OVER cum AS BIGINT) AS posl,
        |    CAST(SUM(n) OVER al AS BIGINT) AS tn,
        |    CAST(SUM(pos) OVER al AS BIGINT) AS tp
        |  FROM agg2
        |  WINDOW cum AS (PARTITION BY node, feat ORDER BY v
        |    ROWS UNBOUNDED PRECEDING),
        |  al AS (PARTITION BY node, feat)
        |), best2 AS (
        |  SELECT node, feat, v,
        |    CAST(nl*nl - posl*posl - (nl-posl)*(nl-posl) AS DOUBLE)
        |      / CAST(nl AS DOUBLE)
        |    + CAST((tn-nl)*(tn-nl) - (tp-posl)*(tp-posl)
        |        - ((tn-nl)-(tp-posl))*((tn-nl)-(tp-posl)) AS DOUBLE)
        |      / CAST(tn-nl AS DOUBLE) AS g,
        |    tn, tp
        |  FROM cand2 WHERE nl > 0 AND tn - nl > 0
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY g, feat, v) = 1
        |), leaves AS (
        |  SELECT l.node || CASE WHEN (CASE WHEN b.feat = 'qty'
        |      THEN l.f_qty ELSE l.f_disc END) <= b.v
        |      THEN 'L' ELSE 'R' END AS node,
        |    l.y
        |  FROM lvl1 l JOIN best2 b ON b.node = l.node
        |), leafagg AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS pos
        |  FROM leaves GROUP BY node
        |)
        |SELECT node, 'split' AS kind, feat AS feature, v AS threshold,
        |  round(g, 9) AS gini, tn AS n, tp AS pos,
        |  CAST(NULL AS BIGINT) AS majority
        |FROM best1
        |UNION ALL
        |SELECT node, 'split', feat, v, round(g, 9), tn, tp,
        |  CAST(NULL AS BIGINT)
        |FROM best2
        |UNION ALL
        |SELECT node, 'leaf', CAST(NULL AS VARCHAR),
        |  CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), n, pos,
        |  CASE WHEN pos * 2 > n THEN 1 ELSE 0 END
        |FROM leafagg
        |ORDER BY node, kind""".stripMargin,

    // q392: the LDP coins replay as the StableHash md5 formula; the
    // debias is exact integer arithmetic with one final /2.0
    "q392_randomized_response" ->
      """WITH langs AS (
        |  SELECT k FROM (SELECT DISTINCT lang AS k FROM documents)
        |  ORDER BY k LIMIT 32
        |), bits AS (
        |  SELECT l.k,
        |    CAST(CASE WHEN d.lang = l.k THEN 1 ELSE 0 END AS BIGINT) AS t,
        |    CAST(CASE WHEN (CAST(md5_number_upper(
        |        CAST(d.doc_id AS VARCHAR) || '#rr#' || l.k) AS HUGEINT)
        |      % 2305843009213693951) % 1000 < 250
        |      THEN 1 ELSE 0 END AS BIGINT) AS flip
        |  FROM documents d, langs l
        |), agg AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_bits,
        |    CAST(SUM((t + flip) % 2) AS BIGINT) AS reported_ones,
        |    CAST(SUM(t) AS BIGINT) AS true_count
        |  FROM bits GROUP BY k
        |)
        |SELECT k AS lang, true_count, reported_ones,
        |  CAST(4 * reported_ones - n_bits AS DOUBLE) / 2.0 AS est_count,
        |  abs(CAST(4 * reported_ones - n_bits AS DOUBLE) / 2.0
        |    - CAST(true_count AS DOUBLE)) AS abs_err
        |FROM agg ORDER BY lang""".stripMargin,

    // q390: the engine's result came through an ORC write + read-back;
    // the oracle aggregates the ORIGINAL parquet — equality proves the
    // format round-trip (values, partition column, decimal math) is
    // lossless
    "q390_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem WHERE l_quantity >= 25.0
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q28_simhash" ->
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        |), hb AS (
        |  SELECT doc_id, md5_number_upper(t) AS L FROM tok
        |), sx AS (
        |  SELECT doc_id,
        |    ${(0 until 64).map(b => s"(CASE WHEN SUM(CASE WHEN (L >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN CAST(${BigInt(1) << b} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)").mkString("\n    + ")} AS sh
        |  FROM hb GROUP BY doc_id)
        |SELECT xa.doc_id, CAST(bit_count(xa.sh) AS BIGINT) AS sh_bits,
        |  CAST(bit_count(xor(xa.sh, xb.sh)) AS BIGINT) AS ham_fwd
        |FROM sx xa LEFT JOIN sx xb ON xb.doc_id = xa.doc_id + 37
        |ORDER BY xa.doc_id""".stripMargin,

    "q363_nb_filter" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 1000 AS BIGINT) < 800 AS is_train,
        |    CAST(doc_id % 2 AS INTEGER) AS y
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, is_train, y,
        |    CAST((CAST(md5_number_upper(t) AS HUGEINT)
        |      % 2305843009213693951) % 256 AS BIGINT) AS b
        |  FROM (SELECT doc_id, is_train, y,
        |          unnest(string_split(text, ' ') ||
        |            CASE WHEN y = 1
        |              THEN ['q363sig', 'q363sig', 'q363sig']
        |              ELSE [] END) AS t FROM d)
        |), counts AS (
        |  SELECT y, b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok WHERE is_train GROUP BY y, b
        |), grid AS (
        |  SELECT yy.y, r.b FROM (VALUES (0), (1)) yy(y), range(0, 256) r(b)
        |), dense AS (
        |  SELECT g.y, g.b, COALESCE(c.c, 0) AS c
        |  FROM grid g LEFT JOIN counts c ON c.y = g.y AND c.b = g.b
        |), tot AS (SELECT y, SUM(c) AS tot FROM dense GROUP BY y
        |), w AS (
        |  SELECT dn.b,
        |    CAST(MAX(CASE WHEN dn.y = 1 THEN
        |        round(ln(CAST(dn.c + 1 AS DOUBLE)), 9)
        |          - round(ln(CAST(t.tot + 256 AS DOUBLE)), 9) END)
        |      - MAX(CASE WHEN dn.y = 0 THEN
        |        round(ln(CAST(dn.c + 1 AS DOUBLE)), 9)
        |          - round(ln(CAST(t.tot + 256 AS DOUBLE)), 9) END)
        |      AS DECIMAL(27,12)) AS w
        |  FROM dense dn JOIN tot t USING (y) GROUP BY dn.b
        |), prior AS (
        |  SELECT CAST(MAX(CASE WHEN y = 1 THEN round(ln(CAST(n AS DOUBLE)), 9) END)
        |      - MAX(CASE WHEN y = 0 THEN round(ln(CAST(n AS DOUBLE)), 9) END)
        |      AS DECIMAL(27,12)) AS prior
        |  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM d WHERE is_train GROUP BY y)
        |), sc AS (
        |  SELECT tok.doc_id, tok.y, SUM(w.w) AS s
        |  FROM tok JOIN w USING (b) WHERE NOT tok.is_train
        |  GROUP BY tok.doc_id, tok.y)
        |SELECT CAST(y AS BIGINT) AS y, CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN sc.s + prior.prior > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_pred_pos
        |FROM sc, prior GROUP BY y ORDER BY y""".stripMargin,

    "q364_incremental_profile" ->
      """WITH p AS (
        |  SELECT 'doc_id' AS "column", 'bigint' AS dtype,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    CAST(MIN(doc_id) AS VARCHAR) AS min_s,
        |    CAST(MAX(doc_id) AS VARCHAR) AS max_s,
        |    CAST(SUM(doc_id) AS BIGINT) AS sum_l
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', 'string', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR),
        |    CAST(NULL AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', 'bigint', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR),
        |    CAST(SUM(n_chars) AS BIGINT)
        |  FROM documents)
        |SELECT * FROM p ORDER BY "column"""".stripMargin,

    "q362_api_ingest" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q371_view_selection" ->
      """WITH dims AS (
        |  SELECT l_returnflag AS f, l_linestatus AS s,
        |    strftime(l_shipdate, '%Y-%m') AS d
        |  FROM lineitem
        |), grp AS (
        |  SELECT CASE WHEN GROUPING(f) = 0 THEN 'f' ELSE '' END ||
        |         CASE WHEN GROUPING(s) = 0 THEN 's' ELSE '' END ||
        |         CASE WHEN GROUPING(d) = 0 THEN 'd' ELSE '' END AS v
        |  FROM dims
        |  GROUP BY GROUPING SETS ((f,s,d),(f,s),(f,d),(s,d),(f),(s),(d),())
        |), costs AS (
        |  SELECT CASE WHEN v = '' THEN '()' ELSE v END AS view,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM grp GROUP BY 1
        |), pairs(view, sub) AS (
        |  VALUES ('fsd','fsd'),('fsd','fs'),('fsd','fd'),('fsd','sd'),
        |    ('fsd','f'),('fsd','s'),('fsd','d'),('fsd','()'),
        |    ('fs','fs'),('fs','f'),('fs','s'),('fs','()'),
        |    ('fd','fd'),('fd','f'),('fd','d'),('fd','()'),
        |    ('sd','sd'),('sd','s'),('sd','d'),('sd','()'),
        |    ('f','f'),('f','()'),('s','s'),('s','()'),
        |    ('d','d'),('d','()'),('()','()')
        |), cbase AS (SELECT c FROM costs WHERE view = 'fsd'),
        |pick1 AS (
        |  SELECT p.view, CAST(SUM(GREATEST(0, (SELECT c FROM cbase) - c2.c))
        |    AS BIGINT) AS benefit
        |  FROM pairs p JOIN costs c2 ON c2.view = p.view
        |  WHERE p.view <> 'fsd'
        |  GROUP BY p.view, c2.c
        |  ORDER BY benefit DESC, p.view LIMIT 1
        |), ans1 AS (
        |  SELECT p.sub AS w, MIN(c.c) AS ac
        |  FROM pairs p JOIN costs c ON c.view = p.view
        |  WHERE p.view = 'fsd' OR p.view = (SELECT view FROM pick1)
        |  GROUP BY p.sub
        |), pick2 AS (
        |  SELECT p.view, CAST(SUM(GREATEST(0, a.ac - c2.c)) AS BIGINT) AS benefit
        |  FROM pairs p JOIN ans1 a ON a.w = p.sub
        |  JOIN costs c2 ON c2.view = p.view
        |  WHERE p.view <> 'fsd' AND p.view <> (SELECT view FROM pick1)
        |  GROUP BY p.view, c2.c
        |  ORDER BY benefit DESC, p.view LIMIT 1
        |)
        |SELECT CAST(0 AS BIGINT) AS round, view, c AS value FROM costs
        |UNION ALL SELECT 1, view, benefit FROM pick1
        |UNION ALL SELECT 2, view, benefit FROM pick2
        |ORDER BY round, view""".stripMargin,

    "q370_ivm_min" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM lineitem
        |), aff AS (
        |  SELECT l_returnflag,
        |    MIN(CASE WHEN l_returnflag = 'R' AND cents < 200000
        |      THEN cents END) AS dmin,
        |    MIN(cents) AS amin
        |  FROM li GROUP BY l_returnflag
        |)
        |SELECT k.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(MIN(k.cents) AS BIGINT) AS min_cents,
        |  COALESCE(a.dmin = a.amin, FALSE) AS recomputed
        |FROM (SELECT * FROM li
        |      WHERE NOT (l_returnflag = 'R' AND cents < 200000)) k
        |JOIN aff a USING (l_returnflag)
        |GROUP BY k.l_returnflag, a.dmin, a.amin
        |ORDER BY k.l_returnflag""".stripMargin,

    "q369_ivm_join" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_quantity < 45
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q376_grouped_quantiles" ->
      """SELECT l_returnflag AS rf, CAST(q_pct AS BIGINT) AS q_pct,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS rank_ok
        |FROM lineitem, (VALUES (25),(50),(75)) t(q_pct)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q378_exact_mad" ->
      """WITH g AS (SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g),
        |c AS (SELECT v, CAST(SUM(n) OVER (ORDER BY v) AS BIGINT) AS cum FROM g),
        |m AS (SELECT MIN(v) AS med FROM c, t WHERE cum * 2 >= nt),
        |dg AS (SELECT ABS(CAST(value AS DECIMAL(18,2)) - (SELECT med FROM m))
        |    AS dv, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |dc AS (SELECT dv, CAST(SUM(n) OVER (ORDER BY dv) AS BIGINT) AS cum
        |    FROM dg)
        |SELECT (SELECT nt FROM t) AS n_rows,
        |  CAST((SELECT med FROM m) AS DOUBLE) AS median,
        |  CAST(MIN(dv) AS DOUBLE) AS mad
        |FROM dc, t WHERE cum * 2 >= nt""".stripMargin,

    "q379_trimmed_mean" ->
      """WITH g AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g),
        |c AS (SELECT v, n, CAST(SUM(n) OVER (ORDER BY v) AS BIGINT) AS cum
        |    FROM g)
        |SELECT nt AS n_rows, nt // 10 AS n_trimmed_each,
        |  FLOOR(CAST(SUM(v * CAST(GREATEST(0, LEAST(cum, nt - nt // 10)
        |      - GREATEST(cum - n, nt // 10)) AS DECIMAL(15,0))) AS DOUBLE)
        |    / CAST(nt - 2 * (nt // 10) AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS trimmed_mean
        |FROM c, t GROUP BY nt""".stripMargin,

    "q380_winsorized_mean" ->
      """WITH g AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g),
        |c AS (SELECT v, n, CAST(SUM(n) OVER (ORDER BY v) AS BIGINT) AS cum
        |    FROM g),
        |cuts AS (SELECT
        |    MIN(CASE WHEN cum >= (5 * nt + 99) // 100 THEN v END) AS p05,
        |    MIN(CASE WHEN cum >= (95 * nt + 99) // 100 THEN v END) AS p95
        |  FROM c, t)
        |SELECT nt AS n_rows, CAST(p05 AS DOUBLE) AS p05,
        |  CAST(p95 AS DOUBLE) AS p95,
        |  -- CASE, not LEAST/GREATEST: duckdb's least/greatest promote
        |  -- DECIMAL to DOUBLE, silently breaking the exact fold
        |  FLOOR(CAST(SUM(CAST(n AS DECIMAL(15,0)) *
        |      (CASE WHEN v < p05 THEN p05
        |            WHEN v > p95 THEN p95 ELSE v END)) AS DOUBLE)
        |    / CAST(nt AS DOUBLE) * 1000000 + 0.5) / 1000000
        |    AS winsorized_mean
        |FROM c, t, cuts GROUP BY nt, p05, p95""".stripMargin,

    "q381_lorenz_deciles" ->
      """WITH cr AS (SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc,
        |    CAST(SUM(rev) AS DECIMAL(38,2)) AS s FROM cr),
        |r AS (SELECT rev, CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey)
        |    AS BIGINT) AS rn FROM cr),
        |d AS (SELECT ((rn - 1) * 10) // nc + 1 AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(rev) AS DECIMAL(38,2)) AS drev, MAX(s) AS s
        |  FROM r, t GROUP BY 1)
        |SELECT decile, n_customers,
        |  FLOOR(CAST(drev AS DOUBLE) / CAST(s AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS rev_share,
        |  FLOOR(CAST(SUM(drev) OVER (ORDER BY decile) AS DOUBLE)
        |    / CAST(s AS DOUBLE) * 1000000 + 0.5) / 1000000 AS cum_share
        |FROM d ORDER BY decile""".stripMargin,

    // q384: the engine really encodes + decodes WAV containers
    // (javax.sound.sampled) per document; the oracle replays the planted
    // PCM arithmetic — sample values, |s|/s² sums, sign-flip zero
    // crossings — so equality proves real container work ran both ways
    "q384_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 50 + doc_id % 97 AS n,
        |    8000 + (doc_id % 5) * 1000 AS rate
        |  FROM documents),
        |s AS (SELECT doc_id, n, rate, unnest(range(n)) AS t FROM d),
        |sv AS (
        |  SELECT doc_id, n, rate, t,
        |    ((doc_id * 2654435761 + t * 9176) % 16777213)
        |      * ((doc_id * 2654435761 + t * 9176) % 16777213)
        |      % 65533 - 32766 AS v
        |  FROM s),
        |fl AS (
        |  SELECT doc_id, n, rate, v,
        |    v * lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS flip
        |  FROM sv)
        |SELECT doc_id, CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum,
        |  CAST(SUM(v * v) AS BIGINT) AS sq_sum,
        |  CAST(SUM(CASE WHEN flip < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS zero_crossings
        |FROM fl GROUP BY doc_id, rate, n ORDER BY doc_id""".stripMargin,

    // q385: acoustic-fingerprint dedup (9th modality) — the oracle
    // replays planted PCM -> 33 window energies -> 32 comparison bits ->
    // 2x16-bit band keys -> capped candidate join -> Hamming, exactly
    // the engine's decode -> fingerprint -> band -> verify chain
    "q385_audio_fp_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 2 AS grp, doc_id % 2 AS p,
        |    64 + (doc_id // 2) % 53 AS n
        |  FROM documents),
        |s AS (SELECT doc_id, grp, p, n, unnest(range(n)) AS t FROM d),
        |sv AS (
        |  SELECT doc_id, n, t,
        |    ((grp * 2654435761 + t * 9176) % 16777213)
        |      * ((grp * 2654435761 + t * 9176) % 16777213)
        |      % 65533 - 32766
        |      + CASE WHEN p = 1 AND t % 2 = 0 THEN 1 ELSE 0 END AS v
        |  FROM s),
        |win AS (
        |  SELECT doc_id, (t * 33) // n AS w, SUM(v * v) AS e
        |  FROM sv GROUP BY 1, 2),
        |bits AS (
        |  SELECT a.doc_id, a.w AS bitpos,
        |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
        |  FROM win a JOIN win b
        |    ON a.doc_id = b.doc_id AND b.w = a.w + 1
        |  WHERE a.w < 32),
        |bands AS (
        |  SELECT doc_id, bitpos // 16 AS band,
        |    SUM(bit << (bitpos % 16)) AS bkey
        |  FROM bits GROUP BY 1, 2),
        |bsz AS (
        |  SELECT band, bkey FROM bands
        |  GROUP BY band, bkey HAVING COUNT(*) <= 100),
        |capped AS (
        |  SELECT b.* FROM bands b JOIN bsz USING (band, bkey)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |ham AS (
        |  SELECT c.id_a, c.id_b,
        |    SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hamming
        |  FROM cand c
        |  JOIN bits x ON x.doc_id = c.id_a
        |  JOIN bits y ON y.doc_id = c.id_b AND y.bitpos = x.bitpos
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        |FROM ham WHERE hamming <= 4 ORDER BY id_a, id_b""".stripMargin,

    // q377: the engine really encodes + decodes PNG bytes per document;
    // the oracle replays only the PLANTED dimension arithmetic — equality
    // proves the decoded rasters carried the planted dims through
    "q377_image_decode" ->
      """SELECT CAST(1 + doc_id % 13 AS BIGINT) AS width,
        |  CAST(1 + doc_id % 7 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  CAST(COUNT(*) AS BIGINT) AS n_images,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 1, 2, 3""".stripMargin,

    "q375_late_dims" ->
      """SELECT 'joined' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders WHERE o_custkey % 3 <> 0
        |UNION ALL
        |SELECT 'orphan', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |FROM orders WHERE o_custkey % 3 = 0
        |ORDER BY cohort""".stripMargin,

    "q374_ivm_topk" ->
      """SELECT l_returnflag AS rf,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |  l_orderkey AS ok, CAST(l_linenumber AS BIGINT) AS ln
        |FROM lineitem
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |  ORDER BY cents DESC, l_orderkey, l_linenumber) <= 3
        |ORDER BY rf, cents DESC, ok, ln""".stripMargin,

    "q373_range_partitioner" ->
      """SELECT CAST(bucket AS BIGINT) AS bucket,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
        |  TRUE AS balanced
        |FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) t(bucket)
        |ORDER BY bucket""".stripMargin,

    "q372_als_foldin" ->
      s"""WITH base AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DECIMAL(9,0)) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey, l_partkey
        |), split AS (
        |  SELECT u, i, r,
        |    CAST((CAST(md5_number_upper(CAST(u AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 1000 AS BIGINT) < 800 AS is_train
        |  FROM base
        |), train AS (SELECT u, i, r FROM split WHERE is_train
        |), hold AS (SELECT u, i, r FROM split WHERE NOT is_train
        |), q0 AS (
        |  SELECT i,
        |    CAST(CAST(10 + i % 7 AS DECIMAL(18,0)) * 0.1 AS DECIMAL(18,9)) AS f0,
        |    CAST(CAST(5 - i % 5 AS DECIMAL(18,0)) * 0.1 AS DECIMAL(18,9)) AS f1
        |  FROM (SELECT DISTINCT i FROM train)
        |), p1 AS (
        |  ${Oracles.alsSolve("u", "i", "q0", "train")}
        |), qa AS (
        |  ${Oracles.alsSolve("i", "u", "p1", "train")}
        |), p2 AS (
        |  ${Oracles.alsSolve("u", "i", "qa", "train")}
        |), qb AS (
        |  ${Oracles.alsSolve("i", "u", "p2", "train")}
        |), fp AS (
        |  ${Oracles.alsSolve("u", "i", "qb", "hold")}
        |), hs AS (SELECT u, i, r FROM hold WHERE i IN (SELECT i FROM qb)
        |), sseh AS (
        |  ${Oracles.alsSse("fp", "qb", "hold")}
        |), sset AS (
        |  ${Oracles.alsSse("p2", "qb", "train")}
        |)
        |SELECT 'foldin' AS cohort,
        |  (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) FROM hs) AS n_users,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hs) AS n_ratings,
        |  (SELECT sse_m2 FROM sseh) AS sse_m2
        |UNION ALL
        |SELECT 'train',
        |  (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) FROM train),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM train),
        |  (SELECT sse_m2 FROM sset)
        |ORDER BY cohort""".stripMargin,

    "q368_als_factorization" ->
      s"""WITH ratings AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DECIMAL(9,0)) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey, l_partkey
        |), q0 AS (
        |  SELECT i,
        |    CAST(CAST(10 + i % 7 AS DECIMAL(18,0)) * 0.1 AS DECIMAL(18,9)) AS f0,
        |    CAST(CAST(5 - i % 5 AS DECIMAL(18,0)) * 0.1 AS DECIMAL(18,9)) AS f1
        |  FROM (SELECT DISTINCT i FROM ratings)
        |), p1 AS (
        |  ${Oracles.alsSolve("u", "i", "q0")}
        |), qa AS (
        |  ${Oracles.alsSolve("i", "u", "p1")}
        |), p2 AS (
        |  ${Oracles.alsSolve("u", "i", "qa")}
        |), qb AS (
        |  ${Oracles.alsSolve("i", "u", "p2")}
        |), sse1 AS (
        |  ${Oracles.alsSse("p1", "qa")}
        |), sse2 AS (
        |  ${Oracles.alsSse("p2", "qb")}
        |), cnt AS (
        |  SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users,
        |    CAST(COUNT(DISTINCT i) AS BIGINT) AS n_items FROM ratings
        |)
        |SELECT CAST(1 AS BIGINT) AS iter, n_users, n_items,
        |  (SELECT sse_m2 FROM sse1) AS sse_m2 FROM cnt
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), n_users, n_items,
        |  (SELECT sse_m2 FROM sse2) FROM cnt
        |ORDER BY iter""".stripMargin,

    "q367_bpe_encode" ->
      """WITH RECURSIVE tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |), words AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_occ FROM tok
        |  WHERE length(w) > 0 GROUP BY w
        |), pr AS (
        |  SELECT substr(w.w, CAST(t.i AS INTEGER), 1) AS l,
        |         substr(w.w, CAST(t.i AS INTEGER) + 1, 1) AS r,
        |         w.n_occ
        |  FROM words w, unnest(generate_series(1, length(w.w) - 1)) AS t(i)
        |  WHERE length(w.w) >= 2
        |), merges AS (
        |  SELECT l, r,
        |    CAST(ROW_NUMBER() OVER (ORDER BY SUM(n_occ) DESC, l, r) - 1
        |      AS INTEGER) AS rank
        |  FROM pr GROUP BY l, r
        |  ORDER BY SUM(n_occ) DESC, l, r LIMIT 8
        |), init AS (
        |  SELECT w, list_transform(generate_series(1, length(w)),
        |    i -> substr(w, CAST(i AS INTEGER), 1)) AS syms
        |  FROM words
        |), rec AS (
        |  SELECT w, syms FROM init
        |  UNION ALL
        |  SELECT r.w,
        |    list_concat(list_concat(r.syms[1:b.i-1],
        |      [r.syms[b.i] || r.syms[b.i+1]]), r.syms[b.i+2:]) AS syms
        |  FROM rec r, LATERAL (
        |    SELECT CAST(t.i AS INTEGER) AS i
        |    FROM unnest(generate_series(1, len(r.syms) - 1)) AS t(i)
        |    JOIN merges m ON m.l = r.syms[CAST(t.i AS INTEGER)]
        |      AND m.r = r.syms[CAST(t.i AS INTEGER) + 1]
        |    ORDER BY m.rank, t.i LIMIT 1
        |  ) b
        |), fin AS (
        |  SELECT w, syms FROM rec
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY w ORDER BY len(syms)) = 1
        |)
        |SELECT wd.w AS w, wd.n_occ, CAST(len(f.syms) AS BIGINT) AS n_syms,
        |  array_to_string(f.syms, '|') AS enc
        |FROM words wd JOIN fin f ON wd.w = f.w ORDER BY wd.w""".stripMargin,

    "q366_qdigest_quantiles" ->
      """SELECT CAST(q_pct AS BIGINT) AS q_pct,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
        |  TRUE AS size_ok, TRUE AS rank_ok
        |FROM (VALUES (1),(25),(50),(75),(99)) t(q_pct)
        |ORDER BY q_pct""".stripMargin,

    "q365_ivm_gold" ->
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderkey % 5 <> 0
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q38_ann_ivf" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(150 AS BIGINT), TRUE, TRUE),
        |  (CAST(4 AS BIGINT), CAST(150 AS BIGINT), TRUE, TRUE),
        |  (CAST(16 AS BIGINT), CAST(150 AS BIGINT), TRUE, TRUE))
        |  AS t(n_probe, n_exact, recall_floor_ok, monotone_ok)
        |ORDER BY n_probe""".stripMargin,

    "q01_agg_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_cast_project" ->
      """SELECT event_id,
        |  CAST(event_id AS VARCHAR) AS event_id_str,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents,
        |  UPPER(event_type) AS type_upper
        |FROM events ORDER BY event_id""".stripMargin,

    "q03_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
        |ORDER BY event_id""".stripMargin,

    "q04_range_check" ->
      """SELECT COUNT(*) AS row_count,
        |  CAST(COALESCE(SUM(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 5 OR l_quantity > 45) THEN 1 ELSE 0 END), 0) AS BIGINT) AS range_l_quantity
        |FROM lineitem""".stripMargin,

    "q05_notnull_check" ->
      """SELECT COUNT(*) AS row_count,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS notnull_o_custkey,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS notnull_o_orderdate
        |FROM orders""".stripMargin,

    "q06_regex_check" ->
      """SELECT COUNT(*) AS row_count,
        |  CAST(COALESCE(SUM(CASE WHEN c_name IS NOT NULL AND NOT regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 ELSE 0 END), 0) AS BIGINT) AS regex_c_name
        |FROM customer""".stripMargin,

    "q07_unique_key" ->
      """SELECT COUNT(*) AS row_count,
        |  CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS unique_l_orderkey_l_linenumber
        |FROM lineitem""".stripMargin,

    "q08_dq_summary" ->
      """SELECT COUNT(*) AS row_count,
        |  CAST(COALESCE(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS notnull_l_orderkey,
        |  CAST(COALESCE(SUM(CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50) THEN 1 ELSE 0 END), 0) AS BIGINT) AS range_l_quantity,
        |  CAST(COALESCE(SUM(CASE WHEN l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.08) THEN 1 ELSE 0 END), 0) AS BIGINT) AS range_l_discount,
        |  CAST(COALESCE(SUM(CASE WHEN l_returnflag IS NOT NULL AND NOT regexp_matches(l_returnflag, '^[ARN]$') THEN 1 ELSE 0 END), 0) AS BIGINT) AS regex_l_returnflag,
        |  CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS unique_l_orderkey_l_linenumber
        |FROM lineitem""".stripMargin,

    "q09_dedup_latest" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q10_scd2" ->
      """SELECT user_id, event_id,
        |  epoch_us(ts) AS valid_from_us,
        |  COALESCE(epoch_us(lead(ts) OVER w), 253402214400000000) AS valid_to_us,
        |  (COALESCE(epoch_us(lead(ts) OVER w), 253402214400000000) = 253402214400000000) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,

    "q11_gold_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region_name,
        |  COALESCE(n_name, 'ALL') AS nation_name,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  COUNT(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,

    "q12_ri_orphans" ->
      """SELECT
        |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS order_orphans,
        |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS lineitem_orphans""".stripMargin,

    "q13_enrich_join" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q14_semi_anti" ->
      """SELECT
        |  (SELECT COUNT(*) FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
        |  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""".stripMargin,

    "q15_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q16_set_ops" ->
      """SELECT
        |  (SELECT COUNT(*) FROM (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' UNION SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000.0)) AS n_union,
        |  (SELECT COUNT(*) FROM (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' INTERSECT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000.0)) AS n_intersect,
        |  (SELECT COUNT(*) FROM (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' EXCEPT SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000.0)) AS n_except""".stripMargin,

    "q17_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rk,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q18_time_windows" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q19_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, session_seq,
        |  MIN(epoch_us(ts)) AS session_start_us,
        |  MAX(epoch_us(ts)) AS session_end_us,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q20_cdc_apply" ->
      """SELECT user_id, event_id,
        |  CASE WHEN event_type = 'signup' THEN 'c' WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "q21_table_metrics" ->
      """SELECT COUNT(*) AS row_count,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS null_totalprice,
        |  epoch_us(MIN(o_orderdate)) AS min_orderdate_us,
        |  epoch_us(MAX(o_orderdate)) AS max_orderdate_us,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |FROM orders""".stripMargin,

    "q22_quarantine" ->
      """SELECT l_orderkey, l_linenumber,
        |  concat_ws(',',
        |    CASE WHEN l_quantity IS NOT NULL AND (l_quantity < 2 OR l_quantity > 48) THEN 'range_l_quantity' END,
        |    CASE WHEN l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.08) THEN 'range_l_discount' END) AS dq_reasons
        |FROM lineitem
        |WHERE (l_quantity IS NOT NULL AND (l_quantity < 2 OR l_quantity > 48))
        |   OR (l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.08))
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q23_dedup_exact" ->
      """SELECT doc_id, n_chars, dup_count FROM (
        |  SELECT min_by(doc_id, doc_id) AS doc_id, min_by(n_chars, doc_id) AS n_chars,
        |         COUNT(*) AS dup_count
        |  FROM documents GROUP BY md5(text)
        |) ORDER BY doc_id""".stripMargin,

    "q24_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
        |  (CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 10000 THEN 0.5 ELSE 0.0 END
        |   + CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the','a','of','and'], t))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 0.01 AND 0.6 THEN 0.5 ELSE 0.0 END) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q25_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','and','of','to','in','is','it','that'], t))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['el','la','los','las','de','que','y','en'], t))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','des','et','que','qui','dans'], t))) AS BIGINT) AS hits_fr
        |  FROM documents)
        |SELECT doc_id, hits_en, hits_es, hits_fr,
        |  CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
        |       WHEN hits_es >= hits_fr THEN 'es' ELSE 'fr' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,

    "q63_lang_confusion" ->
      """WITH s AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','and','of','to','in','is','it','that'], t))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['el','la','los','las','de','que','y','en'], t))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','des','et','que','qui','dans'], t))) AS BIGINT) AS hits_fr
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
        |       WHEN hits_es >= hits_fr THEN 'es' ELSE 'fr' END AS pred_lang,
        |  COUNT(*) AS n_docs
        |FROM s GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,

    "q64_dataset_card" ->
      """WITH b AS (
        |  SELECT lang, text, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 AS bucket
        |  FROM documents)
        |SELECT lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars,
        |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs,
        |  CAST(COALESCE(SUM(CASE WHEN bucket < 800 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_train,
        |  CAST(COALESCE(SUM(CASE WHEN bucket >= 800 AND bucket < 900 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_val,
        |  CAST(COALESCE(SUM(CASE WHEN bucket >= 900 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_test
        |FROM b GROUP BY lang ORDER BY lang""".stripMargin,

    "q26_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  (length(text) + 3) // 4 AS bpe_est,
        |  CAST(length(text) AS INTEGER) AS n_chars_seen
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q27_minhash_dedup" ->
      s"""WITH ${Oracles.minhashPairCtes}
        |SELECT id_a, id_b,
        |  CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard
        |FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q54_dup_clusters" ->
      s"""WITH RECURSIVE ${Oracles.minhashPairCtes},
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        |)
        |SELECT doc_id, cluster_id,
        |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |  doc_id = cluster_id AS keep
        |FROM allc ORDER BY doc_id""".stripMargin,



    "q29_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_distinct(CASE WHEN length(text) >= 3
        |      THEN list_transform(range(1, length(text) - 1), i -> substring(text, CAST(i AS INTEGER), 3))
        |      ELSE [] END) AS g3
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.g3, b.g3)) AS DOUBLE) / CAST(len(list_distinct(a.g3 || b.g3)) AS DOUBLE) AS jaccard
        |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 8
        |WHERE CAST(len(list_intersect(a.g3, b.g3)) AS DOUBLE) / CAST(len(list_distinct(a.g3 || b.g3)) AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q30_ann_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e
        |), q AS (
        |  SELECT * FROM n WHERE vec_id < 8
        |), pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
        |  FROM q, n c WHERE c.vec_id <> q.vec_id
        |), rk AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM pairs)
        |SELECT query_id, neighbor_id, rank, cosine FROM rk
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q31_ann_lsh" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm,
        |    ${graft.similarity.LshAnn.sqlBitString("v", graft.similarity.LshAnn.hyperplanes(64, 8))} AS bkt
        |  FROM e
        |), q AS (
        |  SELECT * FROM n WHERE vec_id < 50
        |), pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
        |  FROM q JOIN n c ON c.bkt = q.bkt AND c.vec_id <> q.vec_id
        |), rk AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM pairs)
        |SELECT query_id, neighbor_id, rank, cosine FROM rk
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q32_embed_topk_pairs" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e
        |), banded AS (
        |  SELECT vec_id, unnest([
        |    ${graft.similarity.LshAnn.sqlBandKeys("v", nTables = 8, nBits = 6, dim = 64, seed = 42L).mkString(",\n    ")}
        |  ]) AS bkey
        |  FROM n
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM banded a JOIN banded b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
        |)
        |SELECT id_a, id_b,
        |  list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS cosine
        |FROM cand JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        |ORDER BY cosine DESC, id_a, id_b LIMIT 20""".stripMargin,

    "q33_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 1857 + 64 AS width,
        |  (ascii(substring(md5(text), 3, 1)) * 256 + ascii(substring(md5(text), 4, 1))) % 1017 + 64 AS height
        |FROM documents ORDER BY media_id""".stripMargin,

    "q34_gold_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q35_merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
        |), updates AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |)
        |SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        |UNION ALL SELECT * FROM updates
        |ORDER BY o_orderkey""".stripMargin,

    "q37_fingerprint" ->
      """WITH codes AS (
        |  SELECT doc_id,
        |    list_transform(range(1, length(text) + 1),
        |      i -> CAST(unicode(substring(text, CAST(i AS INTEGER), 1)) AS BIGINT)) AS cp
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, cp,
        |    CASE WHEN len(cp) >= 8 THEN
        |      list_transform(range(1, len(cp) - 6),
        |        i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cp[i:i+7]),
        |               (a, b) -> (a * 131 + b) % 2147483647))
        |    ELSE [] END AS g
        |  FROM codes
        |)
        |SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), cp),
        |    (a, b) -> (a * 131 + b) % 2147483647) AS doc_fp,
        |  list_min(g) AS min_gram_fp,
        |  CAST(len(list_distinct(g)) AS BIGINT) AS n_gram_fps
        |FROM grams ORDER BY doc_id""".stripMargin,

    "q39_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS prio_upper,
        |  lower(o_orderstatus) AS status_lower,
        |  substring(o_orderpriority, 1, 1) AS prio_code,
        |  CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
        |  concat_ws('#', o_orderstatus, o_orderpriority) AS status_prio,
        |  lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
        |  regexp_replace(o_orderpriority, '[0-9]-', '') AS prio_word,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS o_day,
        |  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
        |  CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_92,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        |  abs(o_custkey - 1000) AS key_dist,
        |  o_orderkey % 7 AS key_mod7
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q40_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q41_array_agg" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(CAST(l_quantity AS BIGINT))), ',') AS qtys_csv,
        |  CAST(len(list(l_quantity)) AS BIGINT) AS n_qtys,
        |  list_sort(list(CAST(l_quantity AS BIGINT)))[1] AS min_qty,
        |  list_sort(list(CAST(l_quantity AS BIGINT)))[-1] AS max_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q42_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 0.0) AS sum_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 0.0) AS sum_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 0.0) AS sum_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q43_heavy_hitters" ->
      """SELECT event_type AS item, COUNT(*) AS n, CAST(0 AS BIGINT) AS max_error
        |FROM events GROUP BY event_type ORDER BY n DESC, item""".stripMargin,

    "q44_normalized_dedup" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id, norm_text, dup_count FROM (
        |  SELECT min_by(doc_id, doc_id) AS doc_id,
        |         min_by(norm_text, doc_id) AS norm_text,
        |         COUNT(*) AS dup_count
        |  FROM n GROUP BY md5(norm_text)
        |) ORDER BY doc_id""".stripMargin,

    "q45_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        |)
        |SELECT p.user_id, p.event_id, epoch_us(p.ts) AS ts_us, c.click_id AS asof_click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q46_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
        |ORDER BY a.user_id, id_a, id_b""".stripMargin,

    "q47_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "q48_schema_evolution" ->
      """SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "q36_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // The IVF search itself isn't SQL-expressible (trained centroids), but
    // its quality gate is: recall_ok must come out true, so an IVF recall
    // regression breaks the hash even though the oracle is constant.
    "q49_ivf_recall" ->
      """SELECT CAST(150 AS BIGINT) AS n_exact,
        |  CAST(1 AS BOOLEAN) AS recall_ok""".stripMargin,

    "q50_pii_redact" ->
      """WITH l AS (
        |  SELECT event_id,
        |    event_type || ' user=' || user_id || ' ip=10.0.' ||
        |    (user_id % 256) || '.' || (event_id % 256) AS line
        |  FROM events)
        |SELECT event_id,
        |  CAST(len(regexp_extract_all(line, 'user=[0-9]+')) AS BIGINT) AS n_ids,
        |  CAST(len(regexp_extract_all(line, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  regexp_replace(
        |    regexp_replace(line, 'user=[0-9]+', 'user=[ID]', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g') AS redacted
        |FROM l ORDER BY event_id""".stripMargin,

    "q51_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), c AS (
        |  SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok
        |)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS n_distinct,
        |  CAST(MAX(c) AS BIGINT) AS top_tok_n,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS rep_ratio,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS distinct_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q52_embed_centroids" ->
      """WITH e AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) v FROM embeddings
        |), n AS (
        |  SELECT label, v, sqrt(list_dot_product(v, v)) nrm FROM e
        |), x AS (
        |  SELECT label, nrm, unnest(v) AS comp, generate_subscripts(v, 1) AS pos FROM n
        |)
        |SELECT label, CAST(pos AS INTEGER) AS pos,
        |  CAST(SUM(CAST(comp / nrm AS DECIMAL(27,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS centroid,
        |  COUNT(*) AS n_vectors
        |FROM x WHERE pos <= 8 GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q56_split_sample" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN bucket < 800 THEN 'train' WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(COALESCE(SUM(CASE WHEN bucket < 100 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_sampled
        |FROM b GROUP BY lang, split ORDER BY lang, split""".stripMargin,

    "q57_rolling_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_s, value
        |  FROM events)
        |SELECT user_id, event_id, ts_s,
        |  COUNT(*) OVER w AS n_trailing_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_s, event_id""".stripMargin,

    "q58_decontamination" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), splits AS (
        |  SELECT doc_id,
        |    CASE WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 800 THEN 'train'
        |         WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT ssa.split AS split_a, ssb.split AS split_b, COUNT(*) AS n_pairs,
        |  ssa.split <> ssb.split AS leaky
        |FROM pairs
        |JOIN splits ssa ON ssa.doc_id = id_a
        |JOIN splits ssb ON ssb.doc_id = id_b
        |GROUP BY ssa.split, ssb.split ORDER BY split_a, split_b""".stripMargin,

    "q59_sequence_packing" ->
      """WITH t AS (
        |  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT lang, doc_id, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, CAST((cum - n_tok) // 4096 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "q60_filter_funnel" ->
      """WITH rep AS (
        |  SELECT doc_id,
        |    CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS rep_ratio
        |  FROM (
        |    SELECT doc_id, tok, count(*) AS c
        |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |    GROUP BY doc_id, tok)
        |  GROUP BY doc_id
        |), flags AS (
        |  SELECT d.n_chars >= 150 AND d.n_chars <= 1000 AS pass_len,
        |    r.rep_ratio < 0.2 AS pass_rep,
        |    d.doc_id = MIN(d.doc_id) OVER (PARTITION BY md5(d.text)) AS is_rep
        |  FROM documents d JOIN rep r ON r.doc_id = d.doc_id)
        |SELECT COUNT(*) AS n_total,
        |  CAST(COALESCE(SUM(CASE WHEN pass_len THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_len,
        |  CAST(COALESCE(SUM(CASE WHEN pass_len AND pass_rep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_len_rep,
        |  CAST(COALESCE(SUM(CASE WHEN pass_len AND pass_rep AND is_rep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_final
        |FROM flags""".stripMargin,

    // Sketch answers aren't SQL-reproducible (HLL++/quantile-sketch
    // internals), but their error bounds are: the booleans must come out
    // true, so sketch accuracy is as hash-gated as exact answers.
    "q61_sketch_gates" ->
      """SELECT CAST(1 AS BOOLEAN) AS hll_ok,
        |  CAST(1 AS BOOLEAN) AS pctl_ok""".stripMargin,

    "q62_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q55_quantiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90,
        |  quantile_cont(value, 0.99) AS p99,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q53_vocab_profile" ->
      """WITH t AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
        |), c AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY lang, tok
        |), r AS (
        |  SELECT lang, tok, n,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS BIGINT) AS rank
        |  FROM c)
        |SELECT lang, tok, n, rank FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,

    "q65_pii_mask" ->
      """SELECT doc_id, sha256(text) AS text, sha256(source) AS source, lang
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q66_retention" ->
      """SELECT event_type, COUNT(*) AS n_kept,
        |  epoch_us(MIN(ts)) AS min_kept_ts_us
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-18 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q68_sampling_mix" ->
      """WITH pl AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang
        |), t AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |    SUM(pow(CAST(n_tokens AS DOUBLE), 0.3)) AS z
        |  FROM pl)
        |SELECT lang, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS p,
        |  round(pow(CAST(n_tokens AS DOUBLE), 0.3) / z, 6) AS w_alpha
        |FROM pl CROSS JOIN t ORDER BY lang""".stripMargin,

    "q69_source_profile" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars,
        |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q70_ngram_decontam" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    CASE WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 800 THEN 'train'
        |         WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, split,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 4),
        |      i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))) AS gram
        |  FROM s WHERE split IN ('train', 'test')
        |), te AS (SELECT DISTINCT gram FROM g WHERE split = 'test')
        |SELECT
        |  (SELECT COUNT(*) FROM s WHERE split = 'train') AS n_train,
        |  (SELECT COUNT(*) FROM s WHERE split = 'test') AS n_test,
        |  (SELECT COUNT(DISTINCT tr.doc_id) FROM g tr JOIN te USING (gram)
        |   WHERE tr.split = 'train') AS n_contaminated_train""".stripMargin,

    "q71_unigram_lm" ->
      """WITH dt AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), c AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM dt GROUP BY doc_id, tok
        |), f AS (
        |  SELECT tok, CAST(SUM(c) AS BIGINT) AS tf FROM c GROUP BY tok
        |), t AS (SELECT CAST(SUM(tf) AS DOUBLE) AS n_total FROM f)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        |  round(CAST(SUM(CAST(CAST(c AS DOUBLE) * (-ln(CAST(tf AS DOUBLE) / n_total)) AS DECIMAL(27,12))) AS DOUBLE)
        |        / CAST(SUM(c) AS DOUBLE), 6) AS avg_nll
        |FROM c JOIN f USING (tok) CROSS JOIN t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q73_k_anonymity" ->
      """WITH g AS (
        |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
        |)
        |SELECT lang, COUNT(*) AS n_groups,
        |  CAST(MIN(n) AS BIGINT) AS min_group_size,
        |  CAST(COALESCE(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_below_k,
        |  MIN(n) >= 5 AS k_anonymous
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin,

    "q76_collocations" ->
      """WITH tk AS (
        |  SELECT string_split(text, ' ') AS t FROM documents
        |), uni AS (
        |  SELECT unnest(t) AS w FROM tk
        |), uc AS (
        |  SELECT w, COUNT(*) AS c FROM uni GROUP BY w
        |), tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM uc),
        |bg AS (
        |  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
        |  FROM tk WHERE len(t) >= 2
        |), bc AS (
        |  SELECT z[1] AS w1, z[2] AS w2, COUNT(*) AS c_ab
        |  FROM bg GROUP BY w1, w2 HAVING COUNT(*) >= 5
        |)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
        |  round(ln(CAST(c_ab AS DOUBLE) * n_total
        |    / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))), 6) AS pmi
        |FROM bc JOIN uc a ON a.w = bc.w1 JOIN uc b ON b.w = bc.w2 CROSS JOIN tot
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    "q77_semantic_decontam" ->
      """WITH b AS (
        |  SELECT vec_id,
        |    CAST((CAST(md5_number_upper(CAST(vec_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 AS BIGINT) AS bucket
        |  FROM embeddings
        |), n AS (
        |  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) AS nrm,
        |    b.bucket
        |  FROM embeddings e JOIN b ON e.vec_id = b.vec_id
        |), tr AS (SELECT * FROM n WHERE bucket < 900),
        |te AS (SELECT * FROM n WHERE bucket >= 900),
        |mx AS (
        |  SELECT tr.vec_id, tr.label,
        |    max(list_dot_product(tr.v, te.v) / (tr.nrm * te.nrm)) AS max_cos
        |  FROM tr, te GROUP BY tr.vec_id, tr.label)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN max_cos >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  round(max(max_cos), 6) AS top_cos
        |FROM mx GROUP BY label ORDER BY label""".stripMargin,

    "q85_index_lifecycle" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |c1 AS (
        |  SELECT doc_id, band FROM bands WHERE doc_id % 10 <> 5
        |  QUALIFY count(*) OVER (PARTITION BY band) <= 100
        |), cand1 AS (
        |  SELECT DISTINCT a.doc_id AS corpus_id, b.doc_id AS batch_id
        |  FROM c1 a JOIN c1 b ON a.band = b.band
        |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
        |), m1 AS (
        |  SELECT corpus_id, batch_id,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard
        |  FROM cand1 JOIN sh sa ON sa.doc_id = corpus_id JOIN sh sb ON sb.doc_id = batch_id
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), cand2 AS (
        |  SELECT DISTINCT a.doc_id AS corpus_id, b.doc_id AS batch_id
        |  FROM capped a JOIN capped b ON a.band = b.band
        |  WHERE a.doc_id % 10 <> 5 AND b.doc_id % 10 = 5
        |), m2 AS (
        |  SELECT corpus_id, batch_id,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard
        |  FROM cand2 JOIN sh sa ON sa.doc_id = corpus_id JOIN sh sb ON sb.doc_id = batch_id
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |)
        |SELECT corpus_id, batch_id, jaccard, CAST(1 AS BIGINT) AS batch FROM m1
        |UNION ALL
        |SELECT corpus_id, batch_id, jaccard, CAST(2 AS BIGINT) AS batch FROM m2
        |ORDER BY batch, corpus_id, batch_id""".stripMargin,

    "q84_simhash_quality" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |ndp AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        |), hb AS (
        |  SELECT doc_id, md5_number_upper(t) AS L FROM tok
        |), sx AS (
        |  SELECT doc_id,
        |    ${(0 until 64).map(b => s"(CASE WHEN SUM(CASE WHEN (L >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN CAST(${BigInt(1) << b} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)").mkString("\n    + ")} AS sh
        |  FROM hb GROUP BY doc_id
        |), nds AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_neardup,
        |    SUM(bit_count(xor(xa.sh, xb.sh))) AS ham_nd
        |  FROM ndp JOIN sx xa ON xa.doc_id = id_a JOIN sx xb ON xb.doc_id = id_b
        |), bgs AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_background,
        |    SUM(bit_count(xor(xa.sh, xb.sh))) AS ham_bg
        |  FROM sx xa JOIN sx xb ON xb.doc_id = xa.doc_id + 37)
        |SELECT nds.n_neardup, bgs.n_background,
        |  round(CAST(nds.ham_nd AS DOUBLE) / CAST(nds.n_neardup AS DOUBLE), 6) AS mean_ham_neardup,
        |  round(CAST(bgs.ham_bg AS DOUBLE) / CAST(bgs.n_background AS DOUBLE), 6) AS mean_ham_background,
        |  round(CAST(nds.ham_nd AS DOUBLE) / CAST(nds.n_neardup AS DOUBLE), 6) + 8.0
        |    <= round(CAST(bgs.ham_bg AS DOUBLE) / CAST(bgs.n_background AS DOUBLE), 6) AS simhash_ok
        |FROM nds, bgs""".stripMargin,

    "q83_decontam_lsh" ->
      s"""WITH b AS (
        |  SELECT vec_id,
        |    CAST((CAST(md5_number_upper(CAST(vec_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 AS BIGINT) AS bucket
        |  FROM embeddings
        |), n AS (
        |  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v,
        |    sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) AS nrm,
        |    b.bucket
        |  FROM embeddings e JOIN b ON e.vec_id = b.vec_id
        |), tr AS (SELECT * FROM n WHERE bucket < 900),
        |te AS (SELECT * FROM n WHERE bucket >= 900),
        |allb AS (
        |  SELECT vec_id, 'l' AS side, unnest([
        |    ${graft.similarity.LshAnn.sqlBandKeys("v", nTables = 8, nBits = 6, dim = 64, seed = 42L).mkString(",\n    ")}
        |  ]) AS bkey FROM tr
        |  UNION ALL
        |  SELECT vec_id, 'r' AS side, unnest([
        |    ${graft.similarity.LshAnn.sqlBandKeys("v", nTables = 8, nBits = 6, dim = 64, seed = 42L).mkString(",\n    ")}
        |  ]) AS bkey FROM te
        |), capped AS (
        |  SELECT vec_id, side, bkey FROM allb
        |  QUALIFY count(*) OVER (PARTITION BY bkey) <= 200
        |), cand AS (
        |  SELECT DISTINCT l.vec_id AS train_id, r.vec_id AS test_id
        |  FROM capped l JOIN capped r ON l.bkey = r.bkey
        |  WHERE l.side = 'l' AND r.side = 'r'
        |), mx AS (
        |  SELECT c.train_id,
        |    max(list_dot_product(tr.v, te.v) / (tr.nrm * te.nrm)) AS max_cos
        |  FROM cand c JOIN tr ON tr.vec_id = c.train_id
        |    JOIN te ON te.vec_id = c.test_id
        |  GROUP BY c.train_id)
        |SELECT tr.label, CAST(COUNT(*) AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN mx.max_cos >= 0.35 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  round(max(mx.max_cos), 6) AS top_cos
        |FROM tr LEFT JOIN mx ON mx.train_id = tr.vec_id
        |GROUP BY tr.label ORDER BY label""".stripMargin,

    "q78_length_buckets" ->
      """WITH c AS (
        |  SELECT quantile_cont(n_chars, 0.25) AS c1, quantile_cont(n_chars, 0.5) AS c2,
        |    quantile_cont(n_chars, 0.75) AS c3
        |  FROM documents
        |), b AS (
        |  SELECT source, n_chars,
        |    CAST((CASE WHEN n_chars >= c1 THEN 1 ELSE 0 END)
        |       + (CASE WHEN n_chars >= c2 THEN 1 ELSE 0 END)
        |       + (CASE WHEN n_chars >= c3 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
        |  FROM documents, c)
        |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,

    "q82_semantic_clusters" ->
      s"""WITH RECURSIVE ev AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM ev
        |), banded AS (
        |  SELECT vec_id, unnest([
        |    ${graft.similarity.LshAnn.sqlBandKeys("v", nTables = 8, nBits = 6, dim = 64, seed = 42L).mkString(",\n    ")}
        |  ]) AS bkey
        |  FROM n
        |), capped AS (
        |  SELECT vec_id, bkey FROM banded
        |  QUALIFY count(*) OVER (PARTITION BY bkey) <= 200
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM capped a JOIN capped b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
        |), pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
        |  WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) >= 0.35
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT em.vec_id, COALESCE(c.comp, em.vec_id) AS cluster_id
        |  FROM embeddings em LEFT JOIN comp c ON c.node = em.vec_id
        |)
        |SELECT vec_id, cluster_id,
        |  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
        |  vec_id = cluster_id AS keep
        |FROM allc ORDER BY vec_id""".stripMargin,

    "q81_group_sample" ->
      """WITH b AS (
        |  SELECT lang, doc_id,
        |    CAST((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000000 AS BIGINT) AS draw
        |  FROM documents
        |), rk AS (
        |  SELECT lang, doc_id, draw,
        |    row_number() OVER (PARTITION BY lang ORDER BY draw, doc_id) AS rn
        |  FROM b)
        |SELECT lang, doc_id, draw FROM rk WHERE rn <= 5
        |ORDER BY lang, draw, doc_id""".stripMargin,

    "q80_incremental_dedup" ->
      s"""WITH ${Oracles.minhashPairCtes}
        |SELECT
        |  CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS corpus_id,
        |  CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS batch_id,
        |  CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard
        |FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
        |  AND CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |ORDER BY corpus_id, batch_id""".stripMargin,

    "q79_blocklist_filter" ->
      """WITH s AS (
        |  SELECT source, len(string_split(text, ' ')) AS n_tok,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('slow', 'big', 'the'))) AS n_blocked
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN n_blocked > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  round(CAST(SUM(n_blocked) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE), 6) AS blocked_ratio
        |FROM s GROUP BY source ORDER BY source""".stripMargin,

    "q75_mixture_sample" ->
      """WITH d AS (
        |  SELECT lang, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), pl AS (
        |  SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM d GROUP BY lang
        |), t AS (
        |  SELECT CAST(SUM(lang_tokens) AS DOUBLE) AS n_total,
        |    SUM(pow(CAST(lang_tokens AS DOUBLE), 0.3)) AS z
        |  FROM pl
        |), r AS (
        |  SELECT lang,
        |    least(1000, CAST(round(500.0
        |      * (pow(CAST(lang_tokens AS DOUBLE), 0.3) / z)
        |      / (CAST(lang_tokens AS DOUBLE) / n_total)) AS BIGINT)) AS rate_permille
        |  FROM pl CROSS JOIN t
        |), s AS (
        |  SELECT d.lang, d.n_tok, r.rate_permille
        |  FROM d JOIN r USING (lang)
        |  WHERE (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < rate_permille)
        |SELECT lang, COUNT(*) AS n_docs_sampled,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens_sampled,
        |  CAST(MAX(rate_permille) AS BIGINT) AS rate_permille
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "q74_winnow_dedup" ->
      s"""WITH ${Oracles.winnowKeptCtes}
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING COUNT(*) >= 40
        |ORDER BY id_a, id_b""".stripMargin,

    "q88_containment_dedup" ->
      s"""WITH ${Oracles.winnowKeptCtes},
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |  HAVING COUNT(*) >= 10
        |), tt AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |), sh3 AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1),
        |             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |      ELSE [] END) AS sg
        |  FROM tt)
        |SELECT id_a, id_b, n_shared,
        |  CAST(len(sa.sg) AS BIGINT) AS n_a,
        |  CAST(len(sb.sg) AS BIGINT) AS n_b,
        |  CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |    / CAST(least(len(sa.sg), len(sb.sg)) AS DOUBLE) AS containment,
        |  CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |    / CAST(len(sa.sg) + len(sb.sg) - len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) AS jaccard
        |FROM cand JOIN sh3 sa ON sa.doc_id = id_a JOIN sh3 sb ON sb.doc_id = id_b
        |WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |    / CAST(least(len(sa.sg), len(sb.sg)) AS DOUBLE) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,

    "q72_embed_quantize" ->
      """WITH e AS (
        |  SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), s AS (
        |  SELECT vec_id, max(abs(x)) / 127.0 AS scale FROM e GROUP BY vec_id
        |), err AS (
        |  SELECT label, e.vec_id,
        |    x - least(greatest(round(x / scale, 0), -127.0), 127.0) * scale AS err
        |  FROM e JOIN s ON s.vec_id = e.vec_id)
        |SELECT label, COUNT(DISTINCT vec_id) AS n_vectors,
        |  round(CAST(SUM(CAST(err * err AS DECIMAL(27,18))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 12) AS mse,
        |  max(abs(err)) AS max_err
        |FROM err GROUP BY label ORDER BY label""".stripMargin,

    "q86_tfidf_terms" ->
      """WITH stc AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
        |), c AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM stc GROUP BY source, tok
        |), d AS (
        |  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM c GROUP BY tok
        |), n AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS ns FROM documents),
        |sc AS (
        |  SELECT source, tok, tf,
        |    round(CAST(tf AS DOUBLE) * ln(ns / df), 6) AS score
        |  FROM c JOIN d USING (tok) CROSS JOIN n
        |), rk AS (
        |  SELECT source, tok, tf, score,
        |    row_number() OVER (PARTITION BY source ORDER BY score DESC, tok) AS rn
        |  FROM sc)
        |SELECT source, tok, tf, score, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 5 ORDER BY source, rank""".stripMargin,

    "q87_doc_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
        |  COUNT(*) AS n_distinct,
        |  round(ln(CAST(SUM(c) AS DOUBLE))
        |    - CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(27,12))) AS DOUBLE)
        |      / CAST(SUM(c) AS DOUBLE), 6) AS entropy
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q92_gopher_rules" ->
      """WITH rep AS (
        |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_n FROM (
        |    SELECT doc_id, tok, COUNT(*) AS c
        |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |    GROUP BY doc_id, tok) GROUP BY doc_id
        |), base AS (
        |  SELECT d.lang,
        |    CAST(length(d.text) AS BIGINT) AS len,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(d.text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stop,
        |    rep.top_n
        |  FROM documents d JOIN rep USING (doc_id)
        |), r AS (
        |  SELECT lang,
        |    n_tok BETWEEN 25 AND 90 AS p_len,
        |    (len - n_tok + 1) * 10 >= n_tok * 43 AND
        |      (len - n_tok + 1) * 10 <= n_tok * 47 AS p_wordlen,
        |    n_stop * 100 >= n_tok * 3 AS p_stop,
        |    top_n * 8 < n_tok AS p_rep
        |  FROM base)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN p_len THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_len,
        |  CAST(SUM(CASE WHEN p_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_wordlen,
        |  CAST(SUM(CASE WHEN p_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stop,
        |  CAST(SUM(CASE WHEN p_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_rep,
        |  CAST(SUM(CASE WHEN p_len AND p_wordlen AND p_stop AND p_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "q91_substring_dup" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 7),
        |      i -> array_to_string(string_split(text, ' ')[i:i+7], ' ')))) AS gram
        |  FROM documents
        |), f AS (SELECT gram, COUNT(*) AS nd FROM g GROUP BY gram)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
        |  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS dup_frac
        |FROM g JOIN f USING (gram) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q94_chunk_dedup" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), ch AS (
        |  SELECT doc_id,
        |    unnest(list_transform(
        |      generate_series(1, CAST(ceil(len(t) / 32.0) AS BIGINT)),
        |      i -> t[(i-1)*32+1:(i-1)*32+32])) AS ctk
        |  FROM tk
        |), c AS (
        |  SELECT doc_id, array_to_string(ctk, ' ') AS chunk,
        |    CAST(len(ctk) AS BIGINT) AS ctok
        |  FROM ch
        |), pd AS (
        |  SELECT doc_id, chunk, COUNT(*) AS n_inst, MAX(ctok) AS ctok
        |  FROM c GROUP BY doc_id, chunk
        |), own AS (
        |  SELECT chunk, MIN(doc_id) AS owner FROM c GROUP BY chunk
        |)
        |SELECT pd.doc_id, CAST(SUM(n_inst) AS BIGINT) AS n_chunks,
        |  COUNT(*) AS n_distinct_chunks,
        |  CAST(SUM(CASE WHEN owner = pd.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_chunks,
        |  CAST(SUM(CASE WHEN owner = pd.doc_id THEN ctok ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM pd JOIN own USING (chunk)
        |GROUP BY pd.doc_id ORDER BY pd.doc_id""".stripMargin,

    "q89_kmeans_clusters" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n0 AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |), vh AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM n0
        |), c0 AS (
        |  SELECT vec_id AS j, v AS c FROM vh
        |  QUALIFY row_number() OVER (ORDER BY vec_id) <= 4
        |), ${Oracles.kmeansIter(1, "c0")},
        |${Oracles.kmeansIter(2, "c1")},
        |af AS (
        |  SELECT vh.vec_id, c2.j, list_dot_product(vh.v, c2.c) AS cos,
        |    c2.c[1] AS c1v
        |  FROM vh CROSS JOIN c2
        |  QUALIFY row_number() OVER (PARTITION BY vh.vec_id ORDER BY cos DESC, j) = 1
        |)
        |SELECT j AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  round(CAST(SUM(CAST(cos AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_cos,
        |  round(MAX(c1v), 6) AS centroid_c1
        |FROM af GROUP BY j ORDER BY cluster""".stripMargin,

    "q90_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    CAST((CAST(md5_number_upper(t) AS HUGEINT) % 2305843009213693951) % 256 AS BIGINT) AS b
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t FROM documents)
        |), c AS (
        |  SELECT b, COUNT(*) AS c_r,
        |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_t
        |  FROM tok GROUP BY b
        |), t AS (
        |  SELECT CAST(SUM(c_r) AS DOUBLE) AS R, CAST(SUM(c_t) AS DOUBLE) AS T FROM c
        |), l AS (
        |  SELECT b,
        |    ln(CAST(c_t + 1 AS DOUBLE) / (T + 256.0))
        |      - ln(CAST(c_r + 1 AS DOUBLE) / (R + 256.0)) AS llr
        |  FROM c CROSS JOIN t)
        |SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |  round(CAST(SUM(CAST(llr AS DECIMAL(27,12))) AS DOUBLE), 6) AS weight,
        |  round(CAST(SUM(CAST(llr AS DECIMAL(27,12))) AS DOUBLE), 6) > 0 AS selected
        |FROM tok JOIN l USING (b)
        |GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,

    "q95_train_materialize" ->
      """WITH s AS (
        |  SELECT doc_id, text, lang,
        |    CASE WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 800 THEN 'train'
        |         WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents
        |), tr AS (SELECT * FROM s WHERE split = 'train'),
        |rep AS (
        |  SELECT MIN(doc_id) AS doc_id FROM tr GROUP BY md5(text)
        |), topn AS (
        |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_n FROM (
        |    SELECT doc_id, tok, COUNT(*) AS c
        |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM tr)
        |    GROUP BY doc_id, tok) GROUP BY doc_id
        |), g AS (
        |  SELECT doc_id, split,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 4),
        |      i -> array_to_string(string_split(text, ' ')[i:i+4], ' ')))) AS gram
        |  FROM s WHERE split IN ('train', 'test')
        |), te AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
        |dirty AS (
        |  SELECT DISTINCT trg.doc_id FROM g trg JOIN te USING (gram)
        |  WHERE trg.split = 'train'
        |), b AS (
        |  SELECT tr.lang,
        |    CAST(len(string_split(tr.text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(length(tr.text) AS BIGINT) AS len,
        |    CAST(len(list_filter(string_split(tr.text, ' '),
        |      x -> x IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS n_stop,
        |    topn.top_n,
        |    tr.doc_id IN (SELECT doc_id FROM rep) AS is_rep,
        |    tr.doc_id NOT IN (SELECT doc_id FROM dirty) AS clean
        |  FROM tr JOIN topn USING (doc_id)
        |), r AS (
        |  SELECT lang, n_tok, is_rep, clean,
        |    (n_tok BETWEEN 25 AND 90
        |      AND (len - n_tok + 1) * 10 >= n_tok * 43
        |      AND (len - n_tok + 1) * 10 <= n_tok * 47
        |      AND n_stop * 100 >= n_tok * 3
        |      AND top_n * 8 < n_tok) AS quality
        |  FROM b)
        |SELECT lang, COUNT(*) AS n_train,
        |  CAST(SUM(CASE WHEN is_rep THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
        |  CAST(SUM(CASE WHEN is_rep AND quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(SUM(CASE WHEN is_rep AND quality AND clean THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
        |  CAST(SUM(CASE WHEN is_rep AND quality AND clean THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_final
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "q96_corpus_drift" ->
      """WITH tok AS (
        |  SELECT lang, doc_id % 2 = 0 AS in_a,
        |    CAST((CAST(md5_number_upper(t) AS HUGEINT) % 2305843009213693951) % 256 AS BIGINT) AS b
        |  FROM (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |), c AS (
        |  SELECT lang, b,
        |    SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS c_a,
        |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS c_b
        |  FROM tok GROUP BY lang, b
        |), t AS (
        |  SELECT lang, CAST(SUM(c_a) AS DOUBLE) AS ta, CAST(SUM(c_b) AS DOUBLE) AS tb
        |  FROM c GROUP BY lang
        |), terms AS (
        |  SELECT c.lang, c_a, c_b,
        |    ((CAST(c_a + 1 AS DOUBLE) / (ta + 256.0)) *
        |      ln((CAST(c_a + 1 AS DOUBLE) / (ta + 256.0))
        |        / (CAST(c_b + 1 AS DOUBLE) / (tb + 256.0)))) AS term
        |  FROM c JOIN t USING (lang))
        |SELECT lang, CAST(SUM(c_a) AS BIGINT) AS tokens_a,
        |  CAST(SUM(c_b) AS BIGINT) AS tokens_b,
        |  round(CAST(SUM(CAST(term AS DECIMAL(27,12))) AS DOUBLE), 6) AS kl_ab
        |FROM terms GROUP BY lang ORDER BY lang""".stripMargin,

    "q97_source_overlap" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |nd AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), cells AS (
        |  SELECT least(da.source, db.source) AS source_lo,
        |    greatest(da.source, db.source) AS source_hi
        |  FROM nd JOIN documents da ON da.doc_id = id_a
        |    JOIN documents db ON db.doc_id = id_b)
        |SELECT source_lo, source_hi, COUNT(*) AS n_pairs
        |FROM cells GROUP BY source_lo, source_hi
        |ORDER BY source_lo, source_hi""".stripMargin,

    "q98_embed_outliers" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n0 AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |), vh AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM n0
        |), c0 AS (
        |  SELECT vec_id AS j, v AS c FROM vh
        |  QUALIFY row_number() OVER (ORDER BY vec_id) <= 4
        |), ${Oracles.kmeansIter(1, "c0")},
        |${Oracles.kmeansIter(2, "c1")},
        |af AS (
        |  SELECT vh.vec_id, c2.j AS cluster, list_dot_product(vh.v, c2.c) AS cos
        |  FROM vh CROSS JOIN c2
        |  QUALIFY row_number() OVER (PARTITION BY vh.vec_id ORDER BY cos DESC, j) = 1
        |), p AS (
        |  SELECT cluster, quantile_cont(cos, 0.1) AS p10 FROM af GROUP BY cluster
        |)
        |SELECT af.cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(SUM(CASE WHEN af.cos < p.p10 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(MAX(p.p10), 6) AS p10_cos
        |FROM af JOIN p USING (cluster)
        |GROUP BY af.cluster ORDER BY af.cluster""".stripMargin,

    "q99_cluster_split" ->
      s"""WITH RECURSIVE ${Oracles.minhashPairCtes},
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT d.doc_id, d.lang, COALESCE(c.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        |), sp AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN (CAST(md5_number_upper(CAST(cluster_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 800 THEN 'train'
        |         WHEN (CAST(md5_number_upper(CAST(cluster_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM allc
        |), leak AS (
        |  SELECT CAST(COALESCE(SUM(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_leaky
        |  FROM pairs JOIN sp a ON a.doc_id = pairs.id_a
        |    JOIN sp b ON b.doc_id = pairs.id_b)
        |SELECT lang, split, COUNT(*) AS n_docs, leak.n_leaky
        |FROM sp, leak GROUP BY lang, split, leak.n_leaky
        |ORDER BY lang, split""".stripMargin,

    "q100_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n AS (
        |  SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |), q AS (
        |  SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
        |  FROM n WHERE vec_id < 20
        |), p AS (
        |  SELECT q.query_id, n.vec_id AS neighbor_id,
        |    list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS cos
        |  FROM q JOIN n ON n.label <> q.qlabel
        |), rk AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM p)
        |SELECT query_id, neighbor_id, cos FROM rk WHERE rn <= 3
        |ORDER BY query_id, cos DESC, neighbor_id""".stripMargin,

    "q101_weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000000 + 1 AS DOUBLE)
        |      / 1000001.0 AS u
        |  FROM documents
        |), k AS (
        |  SELECT doc_id, lang, n_tok, -ln(u) / CAST(n_tok AS DOUBLE) AS key
        |  FROM d)
        |SELECT doc_id, lang, n_tok, round(key, 9) AS draw_key
        |FROM k ORDER BY key, doc_id LIMIT 100""".stripMargin,

    "q102_minhash_estimate" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |nd AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard,
        |    CAST(len(list_filter(range(1, 65), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64.0 AS est
        |  FROM cand JOIN mh sa ON sa.doc_id = id_a JOIN mh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  round(CAST(SUM(CAST(abs(est - jaccard) AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_abs_err,
        |  round(CAST(SUM(CAST(abs(est - jaccard) AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) <= 0.12 AS est_ok
        |FROM nd""".stripMargin,

    "q93_bpe_merges" ->
      """WITH uni AS (
        |  SELECT w, COUNT(*) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |), pairs AS (
        |  SELECT unnest(list_distinct(list_transform(
        |    range(1, length(w)), i -> substring(w, CAST(i AS INTEGER), 2)))) AS pair,
        |    c
        |  FROM uni WHERE length(w) >= 2)
        |SELECT pair, CAST(SUM(c) AS BIGINT) AS n
        |FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "q103_seq_pack" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 8 AS BIGINT) AS shard
        |  FROM documents
        |), c AS (
        |  SELECT lang, shard, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |), s AS (
        |  SELECT lang, shard, COUNT(*) AS nd, SUM(n_tok) AS t,
        |    SUM(CASE WHEN floor(CAST(cum - n_tok AS DOUBLE) / 512.0)
        |          <> floor(CAST(cum - 1 AS DOUBLE) / 512.0) THEN 1 ELSE 0 END) AS str,
        |    CAST(floor(CAST(SUM(n_tok) + 511 AS DOUBLE) / 512.0) AS BIGINT) AS nseq
        |  FROM c GROUP BY lang, shard)
        |SELECT lang, CAST(SUM(nd) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS total_tokens,
        |  CAST(SUM(nseq) AS BIGINT) AS n_sequences,
        |  CAST(SUM(str) AS BIGINT) AS n_straddle_docs,
        |  CAST(SUM(nseq) * 512 - SUM(t) AS BIGINT) AS padding_tokens,
        |  round(CAST(SUM(t) AS DOUBLE) / (CAST(SUM(nseq) AS DOUBLE) * 512.0), 6) AS fill_pct
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "q104_covariance" ->
      """WITH e AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), s2 AS (
        |  SELECT ri.i AS i, rj.j AS j,
        |    SUM(CAST(v[CAST(ri.i + 1 AS INTEGER)] * v[CAST(rj.j + 1 AS INTEGER)] AS DECIMAL(27,12))) AS s2
        |  FROM e, range(0, 64) ri(i), range(0, 64) rj(j)
        |  WHERE rj.j >= ri.i GROUP BY 1, 2
        |), s1 AS (
        |  SELECT ri.i AS i, SUM(CAST(v[CAST(ri.i + 1 AS INTEGER)] AS DECIMAL(27,12))) AS s1
        |  FROM e, range(0, 64) ri(i) GROUP BY 1
        |), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e)
        |SELECT s2.i, s2.j,
        |  round(CAST(s2.s2 AS DOUBLE) / n.n
        |    - (CAST(a.s1 AS DOUBLE) / n.n) * (CAST(b.s1 AS DOUBLE) / n.n), 6) + 0.0 AS cov
        |FROM s2 CROSS JOIN n
        |  JOIN s1 a ON a.i = s2.i JOIN s1 b ON b.i = s2.j
        |ORDER BY s2.i, s2.j""".stripMargin,

    "q105_jl_distortion" -> Oracles.jlDistortionSql,

    "q106_stratified_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000000 AS BIGINT) AS ord
        |  FROM documents
        |), q AS (
        |  SELECT lang, source, COUNT(*) AS n_stratum,
        |    CAST(ceil(CAST(COUNT(*) AS DOUBLE) / 10.0) AS BIGINT) AS quota
        |  FROM d GROUP BY lang, source
        |), r AS (
        |  SELECT doc_id, lang, source, n_tok,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY ord, doc_id) AS rn
        |  FROM d)
        |SELECT lang, source, CAST(MAX(n_stratum) AS BIGINT) AS n_stratum,
        |  CAST(MAX(quota) AS BIGINT) AS quota,
        |  CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |  CAST(SUM(n_tok) AS BIGINT) AS tok_sampled
        |FROM r JOIN q USING (lang, source)
        |WHERE rn <= quota
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "q107_curriculum" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE) AS t
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT SUM(t) AS tt, CAST(COUNT(*) AS DOUBLE) AS s FROM per
        |), raw AS (
        |  SELECT r.epoch AS epoch, source,
        |    pow(t / tt, 1.0 - CAST(r.epoch AS DOUBLE) / 4.0)
        |      * pow(1.0 / s, CAST(r.epoch AS DOUBLE) / 4.0) AS raw
        |  FROM per CROSS JOIN tot CROSS JOIN range(0, 5) r(epoch)
        |), z AS (
        |  SELECT epoch, CAST(SUM(CAST(raw AS DECIMAL(27,12))) AS DOUBLE) AS z
        |  FROM raw GROUP BY epoch)
        |SELECT raw.epoch, source, round(raw / z, 6) AS weight
        |FROM raw JOIN z USING (epoch)
        |ORDER BY epoch, source""".stripMargin,

    "q108_cms_estimate" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |), db AS (
        |  SELECT tok, r.d AS d,
        |    CAST((CAST(md5_number_upper(CAST(r.d AS VARCHAR) || ':' || tok) AS HUGEINT) % 2305843009213693951) % 256 AS BIGINT) AS b
        |  FROM toks CROSS JOIN range(0, 4) r(d)
        |), cms AS (
        |  SELECT d, b, COUNT(*) AS cnt FROM db GROUP BY d, b
        |), top AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact FROM toks GROUP BY tok
        |  ORDER BY exact DESC, tok LIMIT 20
        |), est AS (
        |  SELECT t.tok, t.exact, MIN(c.cnt) AS est
        |  FROM top t CROSS JOIN range(0, 4) r(d)
        |  JOIN cms c ON c.d = r.d AND c.b =
        |    CAST((CAST(md5_number_upper(CAST(r.d AS VARCHAR) || ':' || t.tok) AS HUGEINT) % 2305843009213693951) % 256 AS BIGINT)
        |  GROUP BY t.tok, t.exact)
        |SELECT tok, exact, CAST(est AS BIGINT) AS est,
        |  CAST(est - exact AS BIGINT) AS overestimate,
        |  est >= exact AS cms_ok
        |FROM est ORDER BY exact DESC, tok""".stripMargin,

    "q109_quality_prop" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |nd AS MATERIALIZED (
        |  SELECT id_a, id_b FROM cand
        |  JOIN mh sa ON sa.doc_id = id_a JOIN mh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), ed AS MATERIALIZED (
        |  SELECT id_a AS u, id_b AS v FROM nd
        |  UNION ALL SELECT id_b AS u, id_a AS v FROM nd
        |), sc0 AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS s
        |  FROM t
        |), n1 AS (
        |  SELECT u, CAST(SUM(CAST(b.s AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS av
        |  FROM ed JOIN sc0 b ON b.doc_id = v GROUP BY u
        |), sc1 AS MATERIALIZED (
        |  SELECT a.doc_id,
        |    CASE WHEN n1.u IS NULL THEN a.s ELSE 0.5 * a.s + 0.5 * n1.av END AS s
        |  FROM sc0 a LEFT JOIN n1 ON n1.u = a.doc_id
        |), n2 AS (
        |  SELECT u, CAST(SUM(CAST(b.s AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS av
        |  FROM ed JOIN sc1 b ON b.doc_id = v GROUP BY u
        |), sc2 AS (
        |  SELECT a.doc_id,
        |    CASE WHEN n2.u IS NULL THEN a.s ELSE 0.5 * a.s + 0.5 * n2.av END AS s
        |  FROM sc1 a LEFT JOIN n2 ON n2.u = a.doc_id)
        |SELECT sc0.doc_id, round(sc0.s, 6) AS quality0, round(sc2.s, 6) AS quality2
        |FROM sc0 JOIN sc2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q110_vocab_growth" ->
      """WITH nmax AS (
        |  SELECT CAST(MAX(doc_id) + 1 AS DOUBLE) AS nd FROM documents
        |), toks AS (
        |  SELECT CAST(floor(CAST(doc_id AS DOUBLE) * 10.0 / nd) AS BIGINT) AS decile,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents CROSS JOIN nmax
        |), pd AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks GROUP BY decile
        |), fs AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_new_types FROM (
        |    SELECT tok, MIN(decile) AS decile FROM toks GROUP BY tok)
        |  GROUP BY decile)
        |SELECT pd.decile, pd.n_tokens,
        |  CAST(COALESCE(fs.n_new_types, 0) AS BIGINT) AS n_new_types,
        |  CAST(SUM(COALESCE(fs.n_new_types, 0))
        |    OVER (ORDER BY pd.decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
        |FROM pd LEFT JOIN fs USING (decile)
        |ORDER BY pd.decile""".stripMargin,

    "q111_source_rank" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |nd AS MATERIALIZED (
        |  SELECT id_a, id_b FROM cand
        |  JOIN mh sa ON sa.doc_id = id_a JOIN mh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), sp AS MATERIALIZED (
        |  SELECT da.source AS sa, db.source AS sb FROM nd
        |  JOIN documents da ON da.doc_id = id_a
        |  JOIN documents db ON db.doc_id = id_b
        |  WHERE da.source <> db.source
        |), ed AS MATERIALIZED (
        |  SELECT u, v, CAST(COUNT(*) AS DOUBLE) AS w FROM (
        |    SELECT sa AS u, sb AS v FROM sp
        |    UNION ALL SELECT sb AS u, sa AS v FROM sp) GROUP BY u, v
        |), nodes AS MATERIALIZED (SELECT DISTINCT source AS node FROM documents),
        |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        |ow AS MATERIALIZED (SELECT u, SUM(w) AS ow FROM ed GROUP BY u),
        |r0 AS (SELECT node, 1.0 / n AS r FROM nodes CROSS JOIN nn),
        |c1 AS (
        |  SELECT v, CAST(SUM(CAST(r * w / ow AS DECIMAL(27,12))) AS DOUBLE) AS contrib
        |  FROM r0 JOIN ow ON ow.u = r0.node JOIN ed ON ed.u = r0.node GROUP BY v
        |), d1 AS (
        |  SELECT CAST(COALESCE(SUM(CAST(r AS DECIMAL(27,12))), 0) AS DOUBLE) AS dang
        |  FROM r0 LEFT JOIN ow ON ow.u = r0.node WHERE ow.u IS NULL
        |), r1 AS (
        |  SELECT node, 0.15 / n + 0.85 * (COALESCE(contrib, 0.0) + dang / n) AS r
        |  FROM nodes CROSS JOIN nn CROSS JOIN d1 LEFT JOIN c1 ON c1.v = node
        |), c2 AS (
        |  SELECT v, CAST(SUM(CAST(r * w / ow AS DECIMAL(27,12))) AS DOUBLE) AS contrib
        |  FROM r1 JOIN ow ON ow.u = r1.node JOIN ed ON ed.u = r1.node GROUP BY v
        |), d2 AS (
        |  SELECT CAST(COALESCE(SUM(CAST(r AS DECIMAL(27,12))), 0) AS DOUBLE) AS dang
        |  FROM r1 LEFT JOIN ow ON ow.u = r1.node WHERE ow.u IS NULL
        |), r2 AS (
        |  SELECT node, 0.15 / n + 0.85 * (COALESCE(contrib, 0.0) + dang / n) AS r
        |  FROM nodes CROSS JOIN nn CROSS JOIN d2 LEFT JOIN c2 ON c2.v = node
        |), c3 AS (
        |  SELECT v, CAST(SUM(CAST(r * w / ow AS DECIMAL(27,12))) AS DOUBLE) AS contrib
        |  FROM r2 JOIN ow ON ow.u = r2.node JOIN ed ON ed.u = r2.node GROUP BY v
        |), d3 AS (
        |  SELECT CAST(COALESCE(SUM(CAST(r AS DECIMAL(27,12))), 0) AS DOUBLE) AS dang
        |  FROM r2 LEFT JOIN ow ON ow.u = r2.node WHERE ow.u IS NULL
        |), r3 AS (
        |  SELECT node, 0.15 / n + 0.85 * (COALESCE(contrib, 0.0) + dang / n) AS r
        |  FROM nodes CROSS JOIN nn CROSS JOIN d3 LEFT JOIN c3 ON c3.v = node)
        |SELECT node AS source, round(r, 6) AS pagerank
        |FROM r3 ORDER BY source""".stripMargin,

    "q112_contam_spans" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 800 THEN 'train'
        |         WHEN (CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split,
        |    string_split(text, ' ') AS tk
        |  FROM documents
        |), pg AS (
        |  SELECT doc_id, split, n_tok, unnest(l, recursive := true)
        |  FROM (SELECT doc_id, split, CAST(len(tk) AS BIGINT) AS n_tok,
        |          list_transform(range(0, greatest(len(tk) - 7, 0)),
        |            i -> struct_pack(pos := i, gram := array_to_string(tk[i+1:i+8], ' '))) AS l
        |        FROM s WHERE split IN ('train', 'test'))
        |), te AS (SELECT DISTINCT gram FROM pg WHERE split = 'test'),
        |cov AS (
        |  SELECT doc_id, n_tok, pos, unnest(range(pos, pos + 8)) AS cp
        |  FROM pg JOIN te USING (gram) WHERE split = 'train')
        |SELECT doc_id, CAST(MAX(n_tok) AS BIGINT) AS n_tok,
        |  CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_matched_grams,
        |  CAST(MIN(pos) AS BIGINT) AS first_pos,
        |  CAST(COUNT(DISTINCT cp) AS BIGINT) AS covered_tokens,
        |  round(CAST(COUNT(DISTINCT cp) AS DOUBLE) / CAST(MAX(n_tok) AS DOUBLE), 6) AS coverage
        |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q113_embed_drift" ->
      """WITH ex AS (
        |  SELECT label, vec_id % 2 AS half, ri.i AS i,
        |    CAST(embedding[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE) AS x
        |  FROM embeddings, range(0, 64) ri(i)
        |), m AS (
        |  SELECT label, half, i,
        |    CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m,
        |    COUNT(*) AS nv
        |  FROM ex GROUP BY 1, 2, 3
        |), j AS (
        |  SELECT a.label AS label, a.m AS ma, b.m AS mb, a.nv AS na, b.nv AS nb
        |  FROM m a JOIN m b ON a.label = b.label AND a.i = b.i
        |  WHERE a.half = 0 AND b.half = 1
        |), g AS (
        |  SELECT label, CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
        |    CAST(SUM(CAST(ma * mb AS DECIMAL(27,12))) AS DOUBLE) AS dot,
        |    CAST(SUM(CAST(ma * ma AS DECIMAL(27,12))) AS DOUBLE) AS aa,
        |    CAST(SUM(CAST(mb * mb AS DECIMAL(27,12))) AS DOUBLE) AS bb
        |  FROM j GROUP BY label)
        |SELECT CAST(label AS BIGINT) AS label, n_a, n_b,
        |  round(dot / (sqrt(aa) * sqrt(bb)), 6) AS centroid_cos,
        |  round(dot / (sqrt(aa) * sqrt(bb)), 6) < 0.98 AS drifted
        |FROM g ORDER BY label""".stripMargin,

    "q114_media_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, source,
        |    CAST(strlen(text) AS BIGINT) AS blen,
        |    (ascii(substring(md5(text), 1, 1)) * 256 + ascii(substring(md5(text), 2, 1))) % 1857 + 64 AS w,
        |    (ascii(substring(md5(text), 3, 1)) * 256 + ascii(substring(md5(text), 4, 1))) % 1017 + 64 AS h
        |  FROM documents
        |), r AS (
        |  SELECT media_id, source, w, h,
        |    CASE WHEN w >= h THEN 224
        |         ELSE greatest(CAST(floor(CAST(w * 224 * 2 + h AS DOUBLE) / CAST(h * 2 AS DOUBLE)) AS INTEGER), 1) END AS out_w,
        |    CASE WHEN w >= h THEN greatest(CAST(floor(CAST(h * 224 * 2 + w AS DOUBLE) / CAST(w * 2 AS DOUBLE)) AS INTEGER), 1)
        |         ELSE 224 END AS out_h,
        |    CAST(floor(CAST(greatest(CAST(floor(CAST(blen AS DOUBLE) / 64.0) AS BIGINT) - 1, 0) AS DOUBLE) / 4.0) AS BIGINT) + 1 AS n_frames
        |  FROM m)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(n_frames) AS BIGINT) AS n_frames_sampled,
        |  CAST(SUM(out_w) AS BIGINT) AS sum_out_w,
        |  CAST(SUM(out_h) AS BIGINT) AS sum_out_h,
        |  CAST(MIN(w) AS BIGINT) AS min_w,
        |  CAST(MAX(h) AS BIGINT) AS max_h
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q115_budget_select" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS q
        |  FROM documents
        |), c AS (
        |  SELECT source, n_tok, q,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY q DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(SUM(n_tok) AS BIGINT) AS tok_kept,
        |  round(MIN(q), 6) AS min_quality_kept
        |FROM c WHERE cum - n_tok < 2000
        |GROUP BY source ORDER BY source""".stripMargin,

    "q116_bigram_lm" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), pos AS MATERIALIZED (
        |  SELECT doc_id, unnest(l, recursive := true)
        |  FROM (SELECT doc_id,
        |          list_transform(range(1, len(tk)),
        |            i -> struct_pack(w1 := tk[i], w2 := tk[i+1])) AS l
        |        FROM tk)
        |), cb AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS cb FROM pos GROUP BY w1, w2
        |), cu AS (
        |  SELECT w1, CAST(COUNT(*) AS DOUBLE) AS cu FROM pos GROUP BY w1
        |), uni AS MATERIALIZED (
        |  SELECT unnest(string_split(text, ' ')) AS w2 FROM documents
        |), c2 AS (
        |  SELECT w2, CAST(COUNT(*) AS DOUBLE) AS c2 FROM uni GROUP BY w2
        |), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM uni)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(CAST(-ln(0.7 * (cb / cu) + 0.3 * (c2 / nn)) AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS avg_nll
        |FROM pos JOIN cb USING (w1, w2) JOIN cu USING (w1) JOIN c2 USING (w2)
        |  CROSS JOIN nn
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q117_rag_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), w AS MATERIALIZED (
        |  SELECT doc_id, n_tok, unnest(l, recursive := true)
        |  FROM (SELECT doc_id, n_tok,
        |          list_transform(range(0, CAST(floor(CAST(n_tok - 1 AS DOUBLE) / 32.0) AS BIGINT) + 1),
        |            i -> struct_pack(
        |              h := md5(array_to_string(tk[i*32+1 : i*32+64], ' ')),
        |              wl := CAST(len(tk[i*32+1 : i*32+64]) AS BIGINT))) AS l
        |        FROM d)
        |), b AS (
        |  SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
        |)
        |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  round(CAST(SUM(wl) AS DOUBLE) / CAST(MAX(n_tok) AS DOUBLE), 6) AS expansion_ratio,
        |  CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate_windows
        |FROM w LEFT JOIN b ON b.h = w.h
        |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin,

    "q118_neg_sampling" ->
      """WITH c AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok
        |), z AS (
        |  SELECT CAST(SUM(CAST(pow(CAST(c AS DOUBLE), 0.75) AS DECIMAL(27,12))) AS DOUBLE) AS z
        |  FROM c)
        |SELECT tok, c, round(pow(CAST(c AS DOUBLE), 0.75) / z, 6) AS neg_prob
        |FROM c CROSS JOIN z
        |ORDER BY c DESC, tok LIMIT 20""".stripMargin,

    "q119_robust_stats" ->
      """WITH d AS (
        |  SELECT source, CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok
        |  FROM documents
        |), p AS (
        |  SELECT source, quantile_cont(n_tok, 0.1) AS p10,
        |    quantile_cont(n_tok, 0.9) AS p90,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY source)
        |SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
        |  round(MAX(p10), 6) AS p10, round(MAX(p90), 6) AS p90,
        |  round(CAST(SUM(CAST(greatest(least(n_tok, p90), p10) AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS winsorized_mean,
        |  CAST(SUM(CASE WHEN n_tok < p10 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(SUM(CASE WHEN n_tok > p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
        |FROM d JOIN p USING (source)
        |GROUP BY source ORDER BY source""".stripMargin,

    "q120_lang_source_chi2" ->
      """WITH doc AS (SELECT lang, source FROM documents),
        |cell AS (
        |  SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o
        |  FROM doc GROUP BY lang, source
        |), rt AS (SELECT lang, SUM(o) AS rt FROM cell GROUP BY lang),
        |ct AS (SELECT source, SUM(o) AS ct FROM cell GROUP BY source),
        |dims AS (
        |  SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS ns,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM doc
        |), grid AS (
        |  SELECT rt.rt AS rt, ct.ct AS ct, COALESCE(cell.o, 0.0) AS o
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN cell ON cell.lang = rt.lang AND cell.source = ct.source
        |), chi AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    CAST(SUM(CAST(((o - rt * ct / n) * (o - rt * ct / n)) / (rt * ct / n) AS DECIMAL(27,12))) AS DOUBLE) AS chi2raw
        |  FROM grid CROSS JOIN dims)
        |SELECT n_cells, round(chi2raw, 6) AS chi2,
        |  CAST((nl - 1) * (ns - 1) AS BIGINT) AS dof,
        |  CAST(n AS BIGINT) AS n_docs,
        |  round(sqrt(chi2raw / (n * CAST(least(nl - 1, ns - 1) AS DOUBLE))), 6) AS cramers_v
        |FROM chi CROSS JOIN dims""".stripMargin,

    "q121_quality_classifier" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    list_aggregate(list_transform(string_split(text, ' '),
        |      t -> (CAST(md5_number_upper(t) AS HUGEINT) % 2305843009213693951) % 4096 % 2001 - 1000),
        |      'sum') AS w_sum
        |  FROM documents
        |), s AS (
        |  SELECT source,
        |    round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) +
        |      exp(-(CAST(w_sum AS DOUBLE) / (CAST(n_tok AS DOUBLE) * 1000.0)))), 9) AS score
        |  FROM d)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  round(CAST(SUM(CAST(score AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_score,
        |  CAST(SUM(CASE WHEN score > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |FROM s GROUP BY source ORDER BY source""".stripMargin,

    "q122_bootstrap_se" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), point AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    round(CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_tokens
        |  FROM d
        |), draw AS (
        |  SELECT n_tok, r,
        |    CAST((CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 1000000 + 1 AS DOUBLE) / 1000001.0 AS u
        |  FROM d CROSS JOIN range(16) t(r)
        |), kd AS (
        |  SELECT n_tok, r,
        |    CAST(CASE WHEN u < 0.36787944117144233 THEN 0
        |      WHEN u < 0.7357588823428847 THEN 1
        |      WHEN u < 0.9196986029286058 THEN 2
        |      WHEN u < 0.9810118431238462 THEN 3
        |      WHEN u < 0.9963401531726563 THEN 4
        |      WHEN u < 0.9994058151824183 THEN 5 ELSE 6 END AS BIGINT) AS k
        |  FROM draw
        |), rep AS (
        |  SELECT round(CAST(SUM(k * n_tok) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 9) AS mr
        |  FROM kd GROUP BY r
        |), center AS (
        |  SELECT CAST(SUM(CAST(mr AS DECIMAL(27,12))) AS DOUBLE) / 16.0 AS mbar FROM rep
        |), se AS (
        |  SELECT MAX(mbar) AS mbar,
        |    sqrt(CAST(SUM(CAST((mr - mbar) * (mr - mbar) AS DECIMAL(27,12))) AS DOUBLE) / 15.0) AS se
        |  FROM rep CROSS JOIN center)
        |SELECT n_docs, mean_tokens, round(mbar, 6) AS boot_mean,
        |  round(se, 6) AS boot_se, CAST(16 AS BIGINT) AS n_replicas
        |FROM point CROSS JOIN se""".stripMargin,

    "q123_langid_kappa" ->
      """WITH s AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','and','of','to','in','is','it','that'], t))) AS BIGINT) AS hits_en,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['el','la','los','las','de','que','y','en'], t))) AS BIGINT) AS hits_es,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['le','la','les','des','et','que','qui','dans'], t))) AS BIGINT) AS hits_fr
        |  FROM documents
        |), p AS (
        |  SELECT lang,
        |    CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
        |         WHEN hits_es >= hits_fr THEN 'es' ELSE 'fr' END AS pred
        |  FROM s
        |), cell AS (
        |  SELECT lang, pred, CAST(COUNT(*) AS BIGINT) AS o FROM p GROUP BY lang, pred
        |), nn AS (SELECT SUM(o) AS n FROM cell),
        |dg AS (SELECT COALESCE(SUM(o), 0) AS diag FROM cell WHERE lang = pred),
        |rt AS (SELECT lang, SUM(o) AS rt FROM cell GROUP BY lang),
        |ct AS (SELECT pred, SUM(o) AS ct FROM cell GROUP BY pred),
        |pn AS (
        |  SELECT COALESCE(SUM(CAST(rt.rt AS DECIMAL(19,0)) * CAST(ct.ct AS DECIMAL(19,0))),
        |    CAST(0 AS DECIMAL(38,0))) AS pe_num
        |  FROM rt JOIN ct ON rt.lang = ct.pred)
        |SELECT CAST(n AS BIGINT) AS n_docs,
        |  round(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
        |  round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
        |  round((CAST(diag AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |    / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS kappa
        |FROM dg CROSS JOIN pn CROSS JOIN nn""".stripMargin,

    "q124_temporal_leakage" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms FROM events
        |), c AS (SELECT quantile_cont(CAST(ms AS DOUBLE), 0.8) AS cut FROM e),
        |u AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN CAST(ms AS DOUBLE) <= cut THEN 1 ELSE 0 END) AS n_train,
        |    SUM(CASE WHEN CAST(ms AS DOUBLE) > cut THEN 1 ELSE 0 END) AS n_eval
        |  FROM e CROSS JOIN c GROUP BY user_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN n_train > 0 AND n_eval > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle,
        |  round(CAST(SUM(CASE WHEN n_train > 0 AND n_eval > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS straddle_rate,
        |  CAST(SUM(n_eval) AS BIGINT) AS n_eval_events,
        |  round(CAST(SUM(CASE WHEN n_train > 0 THEN n_eval ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(n_eval) AS DOUBLE), 6) AS eval_leak_share
        |FROM u""".stripMargin,

    "q125_lsh_planner" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |nd AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), cfg AS (
        |  SELECT * FROM (VALUES (CAST(32 AS BIGINT), CAST(2 AS BIGINT)),
        |    (CAST(16 AS BIGINT), CAST(4 AS BIGINT)),
        |    (CAST(8 AS BIGINT), CAST(8 AS BIGINT))) t(bands, rows_per_band)
        |), det AS (
        |  SELECT bands, rows_per_band,
        |    round(1.0 - pow(1.0 - pow(jaccard, CAST(rows_per_band AS DOUBLE)), CAST(bands AS DOUBLE)), 9) AS detect
        |  FROM nd CROSS JOIN cfg)
        |SELECT bands, rows_per_band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  round(CAST(SUM(CAST(detect AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_detect,
        |  CAST(SUM(CASE WHEN detect >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM det GROUP BY bands, rows_per_band ORDER BY bands DESC""".stripMargin,

    "q126_skew_profile" ->
      """WITH kc AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(c) AS BIGINT) AS n_rows,
        |  CAST(MAX(c) AS BIGINT) AS max_count,
        |  round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS max_share,
        |  round((ln(CAST(SUM(c) AS DOUBLE))
        |    - CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(27,12))) AS DOUBLE)
        |      / CAST(SUM(c) AS DOUBLE))
        |    / ln(CAST(COUNT(*) AS DOUBLE)), 6) AS entropy_norm,
        |  CAST(ceil(CAST(MAX(c) AS DOUBLE) * 32.0 / CAST(SUM(c) AS DOUBLE)) AS BIGINT) AS salt_factor
        |FROM kc""".stripMargin,

    "q127_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type, value FROM events
        |), m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med FROM e GROUP BY event_type
        |), dev AS (
        |  SELECT e.event_type, value, med, abs(value - med) AS adev
        |  FROM e JOIN m ON e.event_type = m.event_type
        |), md AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type
        |), z AS (
        |  SELECT dev.event_type, med, mad,
        |    CASE WHEN mad > 0.0 THEN abs(0.6745 * (value - med) / mad) ELSE 0.0 END AS z
        |  FROM dev JOIN md ON dev.event_type = md.event_type)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  round(MAX(med), 6) AS median_value, round(MAX(mad), 6) AS mad,
        |  CAST(SUM(CASE WHEN z > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(CAST(SUM(CASE WHEN z > 3.5 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q128_tail_index" ->
      """WITH top AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents ORDER BY n_tok DESC, doc_id LIMIT 100
        |), xk AS (SELECT CAST(MIN(n_tok) AS DOUBLE) AS xk FROM top),
        |lr AS (
        |  SELECT round(ln(CAST(n_tok AS DOUBLE)) - ln(xk), 9) AS lr, xk
        |  FROM top CROSS JOIN xk)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |  CAST(MAX(xk) AS BIGINT) AS x_min,
        |  round(99.0 / CAST(SUM(CAST(lr AS DECIMAL(27,12))) AS DOUBLE), 6) AS alpha_hat
        |FROM lr""".stripMargin,

    "q129_score_calibration" ->
      """WITH d AS (
        |  SELECT
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','and','of','to','in','is','it','that'], t))) AS BIGINT) AS sw_hits,
        |    list_aggregate(list_transform(string_split(text, ' '),
        |      t -> (CAST(md5_number_upper(t) AS HUGEINT) % 2305843009213693951) % 4096 % 2001 - 1000),
        |      'sum') AS w_sum
        |  FROM documents
        |), s AS (
        |  SELECT n_tok, sw_hits,
        |    round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) +
        |      exp(-(CAST(w_sum AS DOUBLE) / (CAST(n_tok AS DOUBLE) * 1000.0)))), 9) AS score
        |  FROM d
        |), b AS (
        |  SELECT n_tok,
        |    round(CAST(sw_hits AS DOUBLE) / CAST(n_tok AS DOUBLE), 9) AS sw_ratio,
        |    least(CAST(floor(score * 10) AS BIGINT), 9) AS bin
        |  FROM s)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  round(CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_tok,
        |  round(CAST(SUM(CAST(sw_ratio AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_sw_ratio
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q130_benford" ->
      """WITH d AS (
        |  SELECT CAST(floor(value / pow(10.0, floor(log10(value)))) AS BIGINT) AS digit
        |  FROM events WHERE value > 0.0
        |), t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d)
        |SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  round(CAST(COUNT(*) AS DOUBLE) / MAX(n), 6) AS obs_p,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p,
        |  round(abs(CAST(COUNT(*) AS DOUBLE) / MAX(n)
        |    - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6) AS abs_dev
        |FROM d CROSS JOIN t GROUP BY digit ORDER BY digit""".stripMargin,

    "q131_event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
        |), vt AS (
        |  SELECT user_id, MIN(ms) AS vt FROM e WHERE event_type = 'view' GROUP BY user_id
        |), ct AS (
        |  SELECT e.user_id, MIN(ms) AS ct
        |  FROM e JOIN vt ON e.user_id = vt.user_id
        |  WHERE event_type = 'click' AND ms > vt AND ms <= vt + 86400000 GROUP BY e.user_id
        |), pt AS (
        |  SELECT e.user_id, MIN(ms) AS pt
        |  FROM e JOIN ct ON e.user_id = ct.user_id
        |  WHERE event_type = 'purchase' AND ms > ct AND ms <= ct + 86400000 GROUP BY e.user_id
        |), s AS (
        |  SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e) AS n_users,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM vt) AS n_view,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_click_after,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pt) AS n_purchase_after)
        |SELECT n_users, n_view, n_click_after, n_purchase_after,
        |  round(CAST(n_click_after AS DOUBLE) / CAST(n_view AS DOUBLE), 6) AS view_to_click,
        |  round(CAST(n_purchase_after AS DOUBLE) / CAST(n_click_after AS DOUBLE), 6) AS click_to_purchase
        |FROM s""".stripMargin,

    "q132_interarrival" ->
      """WITH g AS (
        |  SELECT ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS gap
        |  FROM (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events)
        |), gg AS (SELECT gap FROM g WHERE gap IS NOT NULL),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    SUM(CAST(gap AS DECIMAL(19,0))) AS s1,
        |    SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS s2,
        |    quantile_cont(gap, 0.5) AS p50,
        |    quantile_cont(gap, 0.9) AS p90
        |  FROM gg)
        |SELECT n_gaps,
        |  round(CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE) / 1000.0, 6) AS mean_gap_s,
        |  round(p50 / 1000.0, 6) AS p50_gap_s,
        |  round(p90 / 1000.0, 6) AS p90_gap_s,
        |  round((sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
        |      - pow(CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE), 2))
        |    - CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |    / (sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
        |      - pow(CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE), 2))
        |    + CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 6) AS burstiness
        |FROM a""".stripMargin,

    "q133_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms FROM events
        |), t0 AS (SELECT MIN(ms) AS t0 FROM e),
        |uw AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor((ms - t0) / 86400000.0) AS BIGINT) AS d
        |  FROM e CROSS JOIN t0
        |), cohort AS (
        |  SELECT user_id, MIN(d) AS cohort_day FROM uw GROUP BY user_id
        |), sizes AS (
        |  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_cohort
        |  FROM cohort GROUP BY cohort_day
        |), act AS (
        |  SELECT cohort_day, d AS day, CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM uw JOIN cohort ON uw.user_id = cohort.user_id
        |  GROUP BY cohort_day, d)
        |SELECT act.cohort_day, day, n_cohort, n_active,
        |  round(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6) AS retention
        |FROM act JOIN sizes ON act.cohort_day = sizes.cohort_day
        |ORDER BY act.cohort_day, day""".stripMargin,

    "q134_embed_isotropy" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n0 AS (
        |  SELECT round(sqrt(list_dot_product(v, v)), 9) AS nrm FROM e
        |), ns AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |    round(CAST(SUM(CAST(nrm AS DECIMAL(27,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE), 6) AS mean_norm
        |  FROM n0
        |), ex AS (
        |  SELECT ri.i AS i, CAST(v[CAST(ri.i + 1 AS INTEGER)] AS DOUBLE) AS x
        |  FROM e, range(0, 64) ri(i)
        |), ds AS (
        |  SELECT i, SUM(CAST(x AS DECIMAL(27,12))) AS s FROM ex GROUP BY i
        |), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
        |cn AS (
        |  SELECT sqrt(CAST(SUM(CAST((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
        |    AS DECIMAL(27,12))) AS DOUBLE)) AS cnorm
        |  FROM ds CROSS JOIN nn)
        |SELECT n_vecs, CAST(64 AS BIGINT) AS dim, mean_norm,
        |  round(cnorm, 6) AS centroid_norm,
        |  round(cnorm / mean_norm, 6) AS isotropy_ratio
        |FROM ns CROSS JOIN cn""".stripMargin,

    "q135_markov_transitions" ->
      """WITH tr AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events)
        |), tt AS (SELECT prev_type, next_type FROM tr WHERE prev_type IS NOT NULL),
        |c AS (
        |  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tt GROUP BY prev_type, next_type
        |), t AS (
        |  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY prev_type)
        |SELECT c.prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p
        |FROM c JOIN t ON c.prev_type = t.prev_type
        |ORDER BY c.prev_type, next_type""".stripMargin,

    "q136_regional_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q137_basket_lift" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), no AS (
        |  SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items
        |), freq AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part FROM items GROUP BY l_partkey
        |), pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT part_a, part_b, n_ab,
        |  round((CAST(n_ab AS DOUBLE) * n_orders)
        |    / (CAST(fa.n_part AS DOUBLE) * CAST(fb.n_part AS DOUBLE)), 6) AS lift
        |FROM pairs
        |JOIN freq fa ON fa.l_partkey = part_a
        |JOIN freq fb ON fb.l_partkey = part_b
        |CROSS JOIN no
        |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin,

    "q138_rfm_segments" ->
      """WITH o AS (
        |  SELECT o_custkey, epoch_ms(o_orderdate) AS ms, o_totalprice FROM orders
        |), tm AS (SELECT MAX(ms) AS tmax FROM o),
        |cust AS (
        |  SELECT o_custkey,
        |    CAST(MAX(tmax) - MAX(ms) AS DOUBLE) / 86400000.0 AS recency_days,
        |    CAST(COUNT(*) AS DOUBLE) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM o CROSS JOIN tm GROUP BY o_custkey
        |), cuts AS (
        |  SELECT quantile_cont(recency_days, 0.33) AS r33, quantile_cont(recency_days, 0.67) AS r67,
        |    quantile_cont(frequency, 0.33) AS f33, quantile_cont(frequency, 0.67) AS f67,
        |    quantile_cont(monetary, 0.33) AS m33, quantile_cont(monetary, 0.67) AS m67
        |  FROM cust
        |), seg AS (
        |  SELECT
        |    CASE WHEN recency_days <= r33 THEN 0 WHEN recency_days <= r67 THEN 1 ELSE 2 END AS r_bucket,
        |    CASE WHEN frequency <= f33 THEN 0 WHEN frequency <= f67 THEN 1 ELSE 2 END AS f_bucket,
        |    CASE WHEN monetary <= m33 THEN 0 WHEN monetary <= m67 THEN 1 ELSE 2 END AS m_bucket,
        |    monetary
        |  FROM cust CROSS JOIN cuts)
        |SELECT CAST(r_bucket AS BIGINT) AS r_bucket, CAST(f_bucket AS BIGINT) AS f_bucket,
        |  CAST(m_bucket AS BIGINT) AS m_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  round(CAST(SUM(CAST(monetary AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_monetary
        |FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q139_zipf_fit" ->
      """WITH v AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok ORDER BY c DESC, tok LIMIT 100
        |), r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank FROM v
        |), xy AS (
        |  SELECT round(ln(CAST(rank AS DOUBLE)), 9) AS x,
        |    round(ln(CAST(c AS DOUBLE)), 9) AS y
        |  FROM r
        |), m AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x * y AS DECIMAL(27,12))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(27,12))) AS DOUBLE) AS sy
        |  FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
        |FROM m""".stripMargin,

    "q140_trend_test" ->
      """WITH e AS (
        |  SELECT epoch_ms(ts) AS ms FROM events
        |), t0 AS (SELECT MIN(ms) AS t0 FROM e),
        |daily AS (
        |  SELECT CAST(floor((ms - t0) / 86400000.0) AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e CROSS JOIN t0 GROUP BY 1
        |), s AS (
        |  SELECT CAST(SUM(CAST(sign(b.c - a.c) AS BIGINT)) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b ON a.d < b.d
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        |ties AS (
        |  SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_corr
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c)
        |  WHERE t > 1
        |), v AS (
        |  SELECT n AS n_days, s_stat,
        |    CAST(n * (n - 1) * (2 * n + 5) - tie_corr AS DOUBLE) / 18.0 AS var_s
        |  FROM s CROSS JOIN n CROSS JOIN ties)
        |SELECT n_days, s_stat, round(var_s, 6) AS var_s,
        |  round((CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE))) / sqrt(var_s), 6) AS z,
        |  abs((CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE))) / sqrt(var_s)) > 1.96 AS trending
        |FROM v""".stripMargin,

    "q141_acf_seasonality" ->
      """WITH e AS (
        |  SELECT epoch_ms(ts) AS ms FROM events
        |), t0 AS (SELECT MIN(ms) AS t0 FROM e),
        |counts AS (
        |  SELECT CAST(floor((ms - t0) / 3600000.0) AS BIGINT) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM e CROSS JOIN t0 GROUP BY 1
        |), hm AS (SELECT MAX(h) AS hmax FROM counts),
        |spine AS (SELECT unnest(range(0, hmax + 1)) AS h FROM hm),
        |series AS (
        |  SELECT spine.h, COALESCE(c, 0) AS c
        |  FROM spine LEFT JOIN counts ON spine.h = counts.h
        |), mu AS (
        |  SELECT CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
        |    CAST(COUNT(*) AS BIGINT) AS n_hours
        |  FROM series
        |), dev AS (
        |  SELECT h, CAST(c AS DOUBLE) - mu AS d, n_hours FROM series CROSS JOIN mu
        |), denom AS (
        |  SELECT CAST(SUM(CAST(d * d AS DECIMAL(27,12))) AS DOUBLE) AS ss,
        |    MAX(n_hours) AS n_hours
        |  FROM dev
        |), lagt AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT)), (CAST(24 AS BIGINT)), (CAST(168 AS BIGINT))) t(lag)),
        |num AS (
        |  SELECT lag, CAST(SUM(CAST(d0.d * d1.d AS DECIMAL(27,12))) AS DOUBLE) AS num
        |  FROM dev d1 CROSS JOIN lagt
        |  JOIN dev d0 ON d0.h = d1.h - lag
        |  GROUP BY lag)
        |SELECT lag, n_hours, round(num / ss, 6) AS acf
        |FROM num CROSS JOIN denom ORDER BY lag""".stripMargin,

    "q142_pair_histogram" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), en AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |), nn AS (SELECT COUNT(*) AS n FROM e),
        |st AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT)), (CAST(7 AS BIGINT)), (CAST(97 AS BIGINT))) t(s)),
        |pr AS (
        |  SELECT a.vec_id, (a.vec_id + s) % n AS tgt, a.v AS va, a.nrm AS na
        |  FROM en a CROSS JOIN nn CROSS JOIN st
        |), cs AS (
        |  SELECT round(list_dot_product(pr.va, b.v) / (pr.na * b.nrm), 9) AS cos
        |  FROM pr JOIN en b ON pr.tgt = b.vec_id
        |  WHERE pr.vec_id <> pr.tgt
        |), bins AS (
        |  SELECT least(CAST(floor((cos + 1.0) * 5) AS BIGINT), 9) AS bin FROM cs)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  round(CAST(COUNT(*) AS DOUBLE) / (CAST(MAX(nn.n) AS DOUBLE) * 3.0), 6) AS share
        |FROM bins CROSS JOIN nn GROUP BY bin ORDER BY bin""".stripMargin,

    "q143_dup_degrees" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pd AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), deg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        |    SELECT id_a AS doc_id FROM pd UNION ALL SELECT id_b AS doc_id FROM pd)
        |  GROUP BY doc_id
        |), hist AS (
        |  SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs FROM deg GROUP BY degree
        |), zero AS (
        |  SELECT CAST(0 AS BIGINT) AS degree,
        |    CAST((SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM deg) AS BIGINT) AS n_docs)
        |SELECT degree, n_docs FROM (
        |  SELECT * FROM hist UNION ALL SELECT * FROM zero)
        |WHERE n_docs > 0 ORDER BY degree""".stripMargin,

    "q144_join_contract" ->
      """WITH li AS (SELECT l_orderkey FROM lineitem),
        |o AS (SELECT o_orderkey FROM orders),
        |ln AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_li,
        |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS li_null_keys
        |  FROM li
        |), onn AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ord_null_keys
        |  FROM o
        |), lo AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS li_orphans
        |  FROM li WHERE l_orderkey IS NOT NULL
        |    AND l_orderkey NOT IN (SELECT o_orderkey FROM o WHERE o_orderkey IS NOT NULL)
        |), oc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS orders_childless
        |  FROM o WHERE o_orderkey IS NOT NULL
        |    AND o_orderkey NOT IN (SELECT l_orderkey FROM li WHERE l_orderkey IS NOT NULL)
        |), f AS (
        |  SELECT CAST(MAX(k) AS BIGINT) AS max_fanout,
        |    round(quantile_cont(k, 0.99), 6) AS p99_fanout
        |  FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM li GROUP BY l_orderkey))
        |SELECT n_li, n_orders, li_null_keys, ord_null_keys, li_orphans,
        |  orders_childless, max_fanout, p99_fanout
        |FROM ln CROSS JOIN onn CROSS JOIN lo CROSS JOIN oc CROSS JOIN f""".stripMargin,

    "q145_unshipped_revenue" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) DESC,
        |  o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q146_small_qty_revenue" ->
      """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        |li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN bp ON l_partkey = p_partkey
        |), st AS (
        |  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
        |    CAST(COUNT(*) AS DECIMAL(18,0)) AS n
        |  FROM li GROUP BY 1)
        |SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
        |  CAST(COUNT(*) AS BIGINT) AS n_small
        |FROM li JOIN st USING (l_partkey)
        |WHERE 5 * CAST(l_quantity AS DECIMAL(18,2)) * n < qty_sum""".stripMargin,

    "q147_last_touch" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'
        |), t AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('click','view','signup')
        |), j AS (
        |  SELECT p.event_id, p.value, p.ts AS pts, t.ts AS tts,
        |    t.event_type AS tt
        |  FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND t.ts <= p.ts)
        |SELECT
        |  CASE WHEN tts IS NOT NULL AND tts >= pts - INTERVAL 7 DAY
        |    THEN tt ELSE 'direct' END AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q148_dup_triangles" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pd AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), tri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |  FROM pd e1 JOIN pd e2 ON e2.id_a = e1.id_b
        |  WHERE EXISTS (SELECT 1 FROM pd e3
        |    WHERE e3.id_a = e1.id_a AND e3.id_b = e2.id_b)
        |), deg AS (
        |  SELECT doc_id, COUNT(*) AS d FROM (
        |    SELECT id_a AS doc_id FROM pd UNION ALL SELECT id_b FROM pd)
        |  GROUP BY doc_id
        |), st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
        |    CAST(SUM(d * (d - 1)) AS BIGINT) // 2 AS n_wedges
        |  FROM deg
        |), ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pd)
        |SELECT n_vertices, n_edges, n_wedges, n_triangles,
        |  CASE WHEN n_wedges > 0
        |    THEN round(3.0 * n_triangles / n_wedges, 6) ELSE 0.0 END
        |    AS clustering_coef
        |FROM st CROSS JOIN ne CROSS JOIN tri""".stripMargin,

    "q149_target_encoding" ->
      """WITH base AS (
        |  SELECT c_mktsegment,
        |    CAST((CAST(md5_number_upper(CAST(o_orderkey AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 5 AS BIGINT) AS fold,
        |    o_totalprice
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), sf AS (
        |  SELECT c_mktsegment, fold,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_sf,
        |    CAST(COUNT(*) AS BIGINT) AS n_sf
        |  FROM base GROUP BY 1, 2
        |), s AS (
        |  SELECT c_mktsegment, SUM(sum_sf) AS sum_s,
        |    CAST(SUM(n_sf) AS BIGINT) AS n_s
        |  FROM sf GROUP BY 1)
        |SELECT sf.c_mktsegment, fold, n_sf AS n_rows,
        |  CASE WHEN n_s > n_sf THEN
        |    round(CAST(sum_s - sum_sf AS DOUBLE) / CAST(n_s - n_sf AS DOUBLE), 6)
        |  END AS oof_mean
        |FROM sf JOIN s ON sf.c_mktsegment = s.c_mktsegment
        |ORDER BY 1, 2""".stripMargin,

    "q150_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q151_order_count_dist" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q152_late_orders" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q153_sole_late_supplier" ->
      """WITH tagged AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM tagged l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.late
        |  AND EXISTS (
        |    SELECT 1 FROM tagged l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM tagged l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 10""".stripMargin,

    "q154_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST((CAST(md5_number_upper(CAST(user_id AS VARCHAR)) AS HUGEINT) % 2305843009213693951) % 2 AS BIGINT) AS arm,
        |    MAX(CASE WHEN event_type = 'purchase' AND value >= 100 THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1
        |), s AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(CAST(conv_a AS DOUBLE)/n_a, 6) AS rate_a,
        |  round(CAST(conv_b AS DOUBLE)/n_b, 6) AS rate_b,
        |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
        |    round((CAST(conv_a AS DOUBLE)/n_a - CAST(conv_b AS DOUBLE)/n_b)
        |      / sqrt((CAST(conv_a + conv_b AS DOUBLE)/(n_a + n_b)) * (1 - CAST(conv_a + conv_b AS DOUBLE)/(n_a + n_b)) * (1.0/n_a + 1.0/n_b)), 6)
        |  END AS z_score
        |FROM s""".stripMargin,

    "q155_quantile_norm" ->
      """WITH t AS (
        |  SELECT event_type,
        |    quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts
        |  FROM events GROUP BY 1
        |), g AS (
        |  SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS gcuts
        |  FROM events)
        |SELECT event_type, CAST(i AS BIGINT) AS decile,
        |  round(cuts[i], 6) AS type_cut,
        |  round(gcuts[i], 6) AS global_cut
        |FROM t CROSS JOIN g CROSS JOIN generate_series(1, 9) AS s(i)
        |ORDER BY event_type, decile""".stripMargin,

    "q156_survival" ->
      """WITH su AS (
        |  SELECT user_id, MIN(ts) AS ts_s FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), fp AS (
        |  SELECT su.user_id, ts_s, MIN(e.ts) AS ts_p
        |  FROM su LEFT JOIN events e
        |    ON e.user_id = su.user_id AND e.event_type = 'purchase'
        |      AND e.ts >= ts_s
        |  GROUP BY 1, 2
        |), mx AS (SELECT MAX(ts) AS ts_max FROM events),
        |dur AS (
        |  SELECT (epoch_us(COALESCE(ts_p, ts_max)) - epoch_us(ts_s)) // 86400000000 AS day,
        |    CASE WHEN ts_p IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM fp CROSS JOIN mx
        |), daily AS (
        |  SELECT day, CAST(SUM(ev) AS BIGINT) AS d,
        |    CAST(SUM(1 - ev) AS BIGINT) AS c
        |  FROM dur GROUP BY day
        |), risk AS (
        |  SELECT day, d, c,
        |    CAST(CAST((SELECT COUNT(*) FROM dur) AS BIGINT)
        |      - COALESCE(SUM(d + c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM daily
        |), surv AS (
        |  SELECT day, d, n_risk,
        |    MIN(1 - CAST(d AS DOUBLE)/n_risk) OVER w AS min_ratio,
        |    SUM(ln(CASE WHEN 1 - CAST(d AS DOUBLE)/n_risk > 0
        |      THEN 1 - CAST(d AS DOUBLE)/n_risk ELSE 1 END)) OVER w AS logsum
        |  FROM risk
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT day, n_risk, d AS d_events,
        |  CASE WHEN min_ratio <= 0 THEN 0.0
        |    ELSE round(exp(logsum), 6) END AS survival
        |FROM surv WHERE d > 0 ORDER BY day""".stripMargin,

    "q157_cumulative_uniques" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms FROM events
        |), t0 AS (SELECT MIN(ms) AS t0 FROM e),
        |fd AS (
        |  SELECT user_id,
        |    MIN(CAST(floor((ms - t0) / 86400000.0) AS BIGINT)) AS day
        |  FROM e CROSS JOIN t0 GROUP BY user_id
        |), daily AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM fd GROUP BY day)
        |SELECT day, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_unique
        |FROM daily ORDER BY day""".stripMargin,

    "q158_cusum_changepoint" ->
      """WITH e AS (
        |  SELECT epoch_ms(ts) AS ms FROM events
        |), t0 AS (SELECT MIN(ms) AS t0 FROM e),
        |daily AS (
        |  SELECT CAST(floor((ms - t0) / 86400000.0) AS BIGINT) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM e CROSS JOIN t0 GROUP BY 1
        |), st AS (
        |  SELECT AVG(x) AS mu, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
        |), cum AS (
        |  SELECT day, x,
        |    SUM(CAST(x AS DOUBLE) - mu) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
        |    mu, n_days
        |  FROM daily CROSS JOIN st)
        |SELECT day, x, round(s, 6) AS cusum, round(abs(s), 6) AS abs_cusum,
        |  round(mu, 6) AS mean_daily, n_days
        |FROM cum
        |ORDER BY abs_cusum DESC, day
        |LIMIT 5""".stripMargin,

    "q159_table_profile" ->
      """SELECT 'l_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(MIN(l_orderkey) AS BIGINT) AS min_long,
        |  CAST(MAX(l_orderkey) AS BIGINT) AS max_long
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_partkey', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
        |  CAST(MIN(l_partkey) AS BIGINT), CAST(MAX(l_partkey) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_suppkey', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
        |  CAST(MIN(l_suppkey) AS BIGINT), CAST(MAX(l_suppkey) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_linenumber', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_linenumber) AS BIGINT),
        |  CAST(MIN(l_linenumber) AS BIGINT), CAST(MAX(l_linenumber) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_shipdate', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |FROM lineitem
        |ORDER BY col_name""".stripMargin,

    "q160_fuzzy_vocab_pairs" ->
      """WITH d AS (
        |  SELECT p_name, CAST(COUNT(*) AS BIGINT) AS freq,
        |    split_part(p_name, ' ', 2) AS blk
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
        |  a.freq AS freq_a, b.freq AS freq_b
        |FROM d a JOIN d b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "q161_event_paths" ->
      """WITH w AS (
        |  SELECT event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts) AS step3
        |  FROM events)
        |SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_paths
        |FROM w WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3
        |LIMIT 10""".stripMargin,

    "q162_moment_profile" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DECIMAL(9,0)) AS d1
        |  FROM events
        |), p AS (
        |  SELECT event_type, d1, d1*d1 AS d2 FROM b
        |), g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(d1) AS s1, SUM(d2) AS s2,
        |    SUM(CAST(d2 AS DECIMAL(19,0))*d1) AS s3,
        |    SUM(CAST(d2 AS DECIMAL(19,0))*d2) AS s4
        |  FROM p GROUP BY 1)
        |SELECT event_type, n,
        |  round((CAST(s1 AS DOUBLE)/n)/100, 6) AS mean,
        |  round(sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))/100, 6) AS sd,
        |  round((CAST(s3 AS DOUBLE)/n - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n) + 2*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        |    / pow(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 1.5), 6) AS skewness,
        |  round((CAST(s4 AS DOUBLE)/n - 4*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n) + 6*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n) - 3*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
        |    / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))*(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))) - 3, 6) AS kurtosis
        |FROM g ORDER BY event_type""".stripMargin,

    "q163_backlog_lindley" ->
      """WITH e AS (
        |  SELECT l_suppkey, epoch_ms(l_shipdate) AS ms,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS qd
        |  FROM lineitem
        |), t0 AS (SELECT MIN(ms) AS t0 FROM e),
        |daily AS (
        |  SELECT l_suppkey,
        |    CAST(floor((ms - t0) / 86400000.0) AS BIGINT) AS day,
        |    SUM(qd) AS q
        |  FROM e CROSS JOIN t0 GROUP BY 1, 2
        |), w AS (
        |  SELECT l_suppkey, day, q,
        |    CAST(COUNT(*) OVER (PARTITION BY l_suppkey) AS BIGINT) AS n_days,
        |    SUM(q) OVER (PARTITION BY l_suppkey) AS s_total
        |  FROM daily
        |), y AS (
        |  SELECT l_suppkey, day, n_days, q * n_days - s_total AS y FROM w
        |), c1 AS (
        |  SELECT l_suppkey, day, n_days,
        |    SUM(y) OVER (PARTITION BY l_suppkey ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM y
        |), c AS (
        |  SELECT l_suppkey, day, n_days, cum,
        |    MIN(cum) OVER (PARTITION BY l_suppkey ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
        |  FROM c1
        |), s AS (
        |  SELECT l_suppkey, day, n_days,
        |    cum - least(CAST(0 AS DECIMAL(38,2)), runmin) AS scaled
        |  FROM c)
        |SELECT l_suppkey, n_days,
        |  round(CAST(MAX(scaled) AS DOUBLE) / n_days, 6) AS max_backlog,
        |  round(CAST(arg_max(scaled, day) AS DOUBLE) / n_days, 6) AS end_backlog,
        |  CAST(SUM(CASE WHEN scaled > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_backlog_days
        |FROM s GROUP BY 1, 2 ORDER BY l_suppkey""".stripMargin,

    "q164_revenue_share" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2
        |), w AS (
        |  SELECT r_name, n_name, rev,
        |    SUM(rev) OVER (PARTITION BY r_name) AS region_total,
        |    SUM(rev) OVER (PARTITION BY r_name ORDER BY rev DESC, n_name ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
        |    rank() OVER (PARTITION BY r_name ORDER BY rev DESC, n_name) AS rnk
        |  FROM rev)
        |SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) / CAST(region_total AS DOUBLE), 6) AS share,
        |  CAST(rnk AS BIGINT) AS rnk,
        |  round(CAST(cum_rev AS DOUBLE) / CAST(region_total AS DOUBLE), 6) AS cum_share
        |FROM w ORDER BY r_name, rnk""".stripMargin,

    "q165_stickiness" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ms FROM events
        |), t AS (SELECT MIN(ms) AS t0, MAX(ms) AS t1 FROM e),
        |ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor((ms - t0) / 86400000.0) AS BIGINT) AS day,
        |    CAST(floor((t1 - t0) / 86400000.0) AS BIGINT) AS max_day
        |  FROM e CROSS JOIN t
        |), dau AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
        |), uw AS (
        |  SELECT DISTINCT user_id, wday FROM ud
        |  CROSS JOIN LATERAL unnest(generate_series(day, day + 6)) AS g(wday)
        |  WHERE wday <= max_day
        |), wau AS (
        |  SELECT wday, CAST(COUNT(*) AS BIGINT) AS wau FROM uw GROUP BY wday)
        |SELECT day, dau, wau,
        |  round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
        |FROM dau JOIN wau ON day = wday
        |ORDER BY day""".stripMargin,

    "q166_revenue_gini" ->
      """WITH cr AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1
        |), r AS (
        |  SELECT rev,
        |    CAST(row_number() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS rnk
        |  FROM cr
        |), s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(rev) AS tot,
        |    SUM(CAST(rnk AS DECIMAL(18,0)) * rev) AS wsum
        |  FROM r)
        |SELECT n, CAST(tot AS DOUBLE) AS total_rev,
        |  round(2.0 * CAST(wsum AS DOUBLE) / (n * CAST(tot AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1)/n, 6) AS gini
        |FROM s""".stripMargin,

    "q167_readability" ->
      """WITH g AS (
        |  SELECT source,
        |    CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_words,
        |    CAST(SUM(greatest(len(regexp_extract_all(text, '[.!?]')), 1)) AS BIGINT) AS n_sents,
        |    CAST(SUM(len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS BIGINT) AS n_syll
        |  FROM documents GROUP BY 1)
        |SELECT source, n_words, n_sents, n_syll,
        |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
        |    - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 6) AS flesch
        |FROM g ORDER BY source""".stripMargin,

    "q168_ship_latency" ->
      """WITH l AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate)) // 86400000000 AS BIGINT) AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(quantile_cont(lag_days, 0.5), 6) AS p50,
        |  round(quantile_cont(lag_days, 0.9), 6) AS p90,
        |  CAST(MAX(lag_days) AS BIGINT) AS max_lag
        |FROM l GROUP BY 1 ORDER BY prio""".stripMargin,

    "q169_jaccard_histogram" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS jaccard
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), hist AS (
        |  SELECT least(CAST(floor(jaccard * 10) AS BIGINT), 9) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n_pairs
        |  FROM pj GROUP BY 1)
        |SELECT bin, round(bin / 10.0, 1) AS thr_lo, n_pairs,
        |  CAST(SUM(n_pairs) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kept_at_threshold
        |FROM hist ORDER BY bin""".stripMargin,

    "q170_partition_advisor" ->
      """WITH src AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events
        |), parts AS (
        |  SELECT event_type, day,
        |    grouping(event_type) AS ge, grouping(day) AS gd,
        |    count(*) AS nrows
        |  FROM src
        |  GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
        |)
        |SELECT
        |  CASE WHEN ge = 0 AND gd = 1 THEN 'event_type'
        |       WHEN ge = 1 AND gd = 0 THEN 'day'
        |       ELSE 'event_type,day' END AS scheme,
        |  CAST(count(*) AS BIGINT) AS n_partitions,
        |  CAST(sum(nrows) AS BIGINT) AS total_rows,
        |  CAST(max(nrows) AS BIGINT) AS max_rows,
        |  round(CAST(sum(nrows) AS DOUBLE) / count(*), 6) AS avg_rows,
        |  round(CAST(max(nrows) AS DOUBLE) * count(*) / sum(nrows), 6) AS skew
        |FROM parts
        |GROUP BY 1
        |ORDER BY scheme""".stripMargin,

    "q171_activity_heatmap" ->
      """WITH g AS (
        |  SELECT isodow(ts) AS iso_dow, CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT iso_dow, hr, n,
        |  round(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share,
        |  n = MAX(n) OVER (PARTITION BY iso_dow) AS is_peak
        |FROM g ORDER BY iso_dow, hr""".stripMargin,

    "q172_bracket_revenue" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 40)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q173_lapsed_customers" ->
      """WITH pos AS (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
        |    CAST(COUNT(*) AS DECIMAL(18,0)) AS n
        |  FROM customer WHERE c_acctbal > 0
        |), rich AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal
        |  FROM customer CROSS JOIN pos
        |  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
        |), lapsed AS (
        |  SELECT * FROM rich r
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = r.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2000-08-01 00:00:00')
        |)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM lapsed JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY n_name""".stripMargin,

    "q174_returned_revenue" ->
      """WITH perCust AS (
        |  SELECT o_custkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, CAST(rev AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM perCust
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin,

    "q175_bilateral_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_17')
        |   OR (n1.n_name = 'NATION_17' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q176_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS v,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |), g AS (
        |  SELECT o_year,
        |    SUM(CASE WHEN supp_nation = 'NATION_7' THEN v
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS nat_vol,
        |    SUM(v) AS tot_vol
        |  FROM vol GROUP BY 1)
        |SELECT o_year, CAST(nat_vol AS DOUBLE) AS nation_volume,
        |  CAST(tot_vol AS DOUBLE) AS total_volume,
        |  round(CAST(nat_vol AS DOUBLE) / CAST(tot_vol AS DOUBLE), 6) AS mkt_share
        |FROM g ORDER BY o_year""".stripMargin,

    "q177_promo_share" ->
      """WITH g AS (
        |  SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
        |    SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_rev,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS tot_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        |  GROUP BY 1)
        |SELECT ship_month, CAST(promo_rev AS DOUBLE) AS promo_revenue,
        |  CAST(tot_rev AS DOUBLE) AS total_revenue,
        |  round(100.0 * CAST(promo_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE), 6) AS promo_pct
        |FROM g ORDER BY ship_month""".stripMargin,

    "q178_cluster_canonical" ->
      s"""WITH RECURSIVE ${Oracles.minhashPairCtes},
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT d.doc_id, d.n_chars, COALESCE(c.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        |), canon AS (
        |  SELECT cluster_id, doc_id AS canonical_id FROM (
        |    SELECT cluster_id, doc_id,
        |      row_number() OVER (PARTITION BY cluster_id
        |        ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM allc)
        |  WHERE rn = 1)
        |SELECT a.doc_id, a.cluster_id, c.canonical_id,
        |  a.doc_id = c.canonical_id AS keep
        |FROM allc a JOIN canon c ON a.cluster_id = c.cluster_id
        |ORDER BY a.doc_id""".stripMargin,

    "q179_dedup_savings" ->
      s"""WITH RECURSIVE ${Oracles.minhashPairCtes},
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), comp AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |), allc AS (
        |  SELECT d.doc_id, d.n_chars, COALESCE(c.comp, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        |), canon AS (
        |  SELECT cluster_id, doc_id AS canonical_id FROM (
        |    SELECT cluster_id, doc_id,
        |      row_number() OVER (PARTITION BY cluster_id
        |        ORDER BY n_chars DESC, doc_id) AS rn
        |    FROM allc)
        |  WHERE rn = 1
        |), mem AS (
        |  SELECT d.source,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS toks,
        |    CAST(length(d.text) AS BIGINT) AS bytes,
        |    a.doc_id <> c.canonical_id AS dropped
        |  FROM allc a
        |  JOIN canon c ON a.cluster_id = c.cluster_id
        |  JOIN documents d ON d.doc_id = a.doc_id)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(SUM(toks) AS BIGINT) AS tokens_total,
        |  CAST(SUM(CASE WHEN dropped THEN toks ELSE 0 END) AS BIGINT) AS tokens_saved,
        |  CAST(SUM(CASE WHEN dropped THEN bytes ELSE 0 END) AS BIGINT) AS bytes_saved,
        |  round(100.0 * SUM(CASE WHEN dropped THEN toks ELSE 0 END) / SUM(toks), 6) AS pct_tokens_saved
        |FROM mem GROUP BY 1 ORDER BY source""".stripMargin,

    "q180_sketch_rollup" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(1 AS BOOLEAN) AS sketch_ok
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q181_join_cardinality" ->
      """WITH ok AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |lk AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |ck AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
        |oc AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |eu AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
        |j1 AS (
        |  SELECT 'orders_lineitem' AS join_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
        |    CAST(SUM(l.c * r.c) AS BIGINT) AS est_rows,
        |    CAST(MAX(l.c * r.c) AS BIGINT) AS max_key_pairs
        |  FROM ok l JOIN lk r ON l.k = r.k),
        |j2 AS (
        |  SELECT 'customer_orders' AS join_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
        |    CAST(SUM(l.c * r.c) AS BIGINT) AS est_rows,
        |    CAST(MAX(l.c * r.c) AS BIGINT) AS max_key_pairs
        |  FROM ck l JOIN oc r ON l.k = r.k),
        |j3 AS (
        |  SELECT 'events_self_user' AS join_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
        |    CAST(SUM(l.c * r.c) AS BIGINT) AS est_rows,
        |    CAST(MAX(l.c * r.c) AS BIGINT) AS max_key_pairs
        |  FROM eu l JOIN eu r ON l.k = r.k),
        |u AS (SELECT * FROM j1 UNION ALL SELECT * FROM j2 UNION ALL SELECT * FROM j3)
        |SELECT join_name, n_matched_keys, est_rows, max_key_pairs,
        |  round(100.0 * max_key_pairs / est_rows, 6) AS skew_pct
        |FROM u ORDER BY join_name""".stripMargin,

    "q182_bloom_gate" ->
      """WITH keys AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00')
        |SELECT
        |  CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_filter_keys,
        |  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_total_rows,
        |  CAST((SELECT COUNT(*) FROM lineitem
        |    WHERE l_orderkey IN (SELECT o_orderkey FROM keys)) AS BIGINT) AS n_matched_rows,
        |  CAST(1 AS BOOLEAN) AS no_false_negatives,
        |  CAST(1 AS BOOLEAN) AS fpr_ok""".stripMargin,

    "q183_prefix_join" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') tk FROM documents
        |), d AS (
        |  SELECT doc_id, sg, len(sg) AS ns FROM (
        |    SELECT doc_id,
        |      list_distinct(CASE WHEN len(tk) >= 3
        |        THEN list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |        ELSE [] END) AS sg
        |    FROM t)
        |  WHERE len(sg) > 0
        |), gf AS (
        |  SELECT g, COUNT(*) AS c
        |  FROM d, unnest(sg) AS u(g) GROUP BY 1
        |), ranked AS (
        |  SELECT doc_id, ns, g,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c, g) AS pos
        |  FROM (SELECT doc_id, ns, g FROM d, unnest(sg) AS u(g)) e
        |  JOIN gf USING (g)
        |), pref AS (
        |  SELECT doc_id, ns, g FROM ranked
        |  WHERE pos <= ns - ((ns + 1) // 2) + 1
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM pref a JOIN pref b ON a.g = b.g
        |  WHERE a.doc_id < b.doc_id
        |    AND a.ns * 2 >= b.ns AND b.ns * 2 >= a.ns
        |), j AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(da.sg, db.sg)) AS DOUBLE) /
        |      CAST(len(list_distinct(da.sg || db.sg)) AS DOUBLE) AS jaccard
        |  FROM cand JOIN d da ON da.doc_id = id_a JOIN d db ON db.doc_id = id_b)
        |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q184_lsh_recall" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |lshp AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh_pairs FROM (
        |    SELECT id_a FROM cand
        |    JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |    WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5)
        |), d AS (
        |  SELECT doc_id, sg, len(sg) AS ns FROM sh WHERE len(sg) > 0
        |), gf AS (
        |  SELECT g, COUNT(*) AS c FROM d, unnest(sg) AS u(g) GROUP BY 1
        |), ranked AS (
        |  SELECT doc_id, ns, g,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c, g) AS pos
        |  FROM (SELECT doc_id, ns, g FROM d, unnest(sg) AS u(g)) e
        |  JOIN gf USING (g)
        |), pref AS (
        |  SELECT doc_id, ns, g FROM ranked
        |  WHERE pos <= ns - ((ns + 1) // 2) + 1
        |), pcand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM pref a JOIN pref b ON a.g = b.g
        |  WHERE a.doc_id < b.doc_id
        |    AND a.ns * 2 >= b.ns AND b.ns * 2 >= a.ns
        |), exj AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs FROM (
        |    SELECT id_a FROM pcand
        |    JOIN d da ON da.doc_id = id_a JOIN d db ON db.doc_id = id_b
        |    WHERE CAST(len(list_intersect(da.sg, db.sg)) AS DOUBLE) / CAST(len(list_distinct(da.sg || db.sg)) AS DOUBLE) >= 0.5)
        |)
        |SELECT n_exact_pairs, n_lsh_pairs,
        |  round(CAST(n_lsh_pairs AS DOUBLE) / CAST(n_exact_pairs AS DOUBLE), 6) AS recall,
        |  n_lsh_pairs <= n_exact_pairs AS lsh_subset_of_exact
        |FROM exj CROSS JOIN lshp""".stripMargin,

    "q185_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q186_window_profile" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume_dist,
        |  first_value(o_totalprice) OVER wf AS cheapest,
        |  nth_value(o_totalprice, 2) OVER wf AS second_cheapest,
        |  last_value(o_totalprice) OVER wf AS priciest
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q187_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    MIN(l_extendedprice) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |pr AS (
        |  SELECT p_partkey, p_name, p_size FROM part
        |  WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20),
        |costs AS (SELECT * FROM ps JOIN pr ON ps_partkey = p_partkey),
        |mc AS (
        |  SELECT ps_partkey AS mk, MIN(ps_supplycost) AS min_cost
        |  FROM costs GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
        |FROM costs
        |JOIN mc ON ps_partkey = mk AND ps_supplycost = min_cost
        |JOIN supplier ON ps_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin,

    "q188_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_delta,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE year(l_shipdate) = 1997
        |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin,

    "q189_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(SUM(
        |    CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) -
        |    CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1)) *
        |      CAST(l_quantity AS DECIMAL(4,1))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q190_important_stock" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS part_value
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        |  GROUP BY 1),
        |tot AS (SELECT SUM(part_value) AS total_value FROM pv)
        |SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
        |FROM pv, tot
        |WHERE part_value * 1000 > total_value
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q191_priority_split" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(l_shipdate) = 1997
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q192_supplier_census" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps
        |JOIN part ON ps_partkey = p_partkey
        |WHERE p_type <> 'PROMO' AND p_size BETWEEN 15 AND 35
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q193_dominant_supplier" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(12,1))) AS supp_qty
        |  FROM lineitem
        |  WHERE year(l_shipdate) = 1997
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey AS pk, SUM(supp_qty) AS part_qty
        |  FROM shipped GROUP BY 1),
        |dom AS (
        |  SELECT DISTINCT l_suppkey FROM shipped
        |  JOIN pt ON l_partkey = pk
        |  WHERE supp_qty * 10 > part_qty * 3)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
        |ORDER BY s_suppkey""".stripMargin,

    "q194_correlation_matrix" -> corrMatrixSql,

    "q195_ols_regression" ->
      """WITH src AS (
        |  SELECT
        |    CAST(CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(11,0)) AS x1,
        |    CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(11,0)) AS x2,
        |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(11,0)) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
        |    SUM(CAST(x1 AS DECIMAL(19,0)) * x1) AS sx1x1,
        |    SUM(CAST(x2 AS DECIMAL(19,0)) * x2) AS sx2x2,
        |    SUM(CAST(x1 AS DECIMAL(19,0)) * x2) AS sx1x2,
        |    SUM(CAST(x1 AS DECIMAL(19,0)) * y) AS sx1y,
        |    SUM(CAST(x2 AS DECIMAL(19,0)) * y) AS sx2y,
        |    SUM(CAST(y AS DECIMAL(19,0)) * y) AS syy
        |  FROM src),
        |d AS (
        |  SELECT n, CAST(n AS DOUBLE) AS a11, CAST(sx1 AS DOUBLE) AS a12,
        |    CAST(sx2 AS DOUBLE) AS a13, CAST(sx1x1 AS DOUBLE) AS a22,
        |    CAST(sx1x2 AS DOUBLE) AS a23, CAST(sx2x2 AS DOUBLE) AS a33,
        |    CAST(sy AS DOUBLE) AS b1, CAST(sx1y AS DOUBLE) AS b2,
        |    CAST(sx2y AS DOUBLE) AS b3, CAST(syy AS DOUBLE) AS syy
        |  FROM s),
        |dets AS (
        |  SELECT n, b1, b2, b3, syy, a11,
        |    a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
        |      + a13*(a12*a23 - a22*a13) AS det,
        |    b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
        |      + a13*(b2*a23 - a22*b3) AS det0,
        |    a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13)
        |      + a13*(a12*b3 - b2*a13) AS det1,
        |    a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13)
        |      + b1*(a12*a23 - a22*a13) AS det2
        |  FROM d),
        |c AS (
        |  SELECT n, b1, b2, b3, syy, a11,
        |    det0/det AS c0, det1/det AS c1, det2/det AS c2
        |  FROM dets)
        |SELECT n,
        |  round(c0/100, 6) AS intercept,
        |  round(c1, 6) AS beta_quantity,
        |  round(c2, 6) AS beta_discount,
        |  round(1 - (syy - c0*b1 - c1*b2 - c2*b3)
        |    / (syy - b1*b1/a11), 6) AS r2
        |FROM c""".stripMargin,

    "q196_mutual_information" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |bl AS (SELECT lang, SUM(c) AS cl FROM cells GROUP BY 1),
        |bs AS (SELECT source, SUM(c) AS cs FROM cells GROUP BY 1),
        |nt AS (SELECT SUM(c) AS nn FROM cells),
        |mi AS (
        |  SELECT SUM(CAST((CAST(c AS DOUBLE)/nn) *
        |    ln(CAST(c AS DOUBLE)*nn / (CAST(cl AS DOUBLE)*cs))
        |    AS DECIMAL(27,12))) AS mi_d
        |  FROM cells JOIN bl USING (lang) JOIN bs USING (source) CROSS JOIN nt),
        |hl AS (
        |  SELECT SUM(CAST(-(CAST(cl AS DOUBLE)/nn) * ln(CAST(cl AS DOUBLE)/nn)
        |    AS DECIMAL(27,12))) AS hl_d
        |  FROM bl CROSS JOIN nt),
        |hs AS (
        |  SELECT SUM(CAST(-(CAST(cs AS DOUBLE)/nn) * ln(CAST(cs AS DOUBLE)/nn)
        |    AS DECIMAL(27,12))) AS hs_d
        |  FROM bs CROSS JOIN nt)
        |SELECT round(CAST(mi_d AS DOUBLE), 6) AS mi,
        |  round(CAST(hl_d AS DOUBLE), 6) AS h_lang,
        |  round(CAST(hs_d AS DOUBLE), 6) AS h_source,
        |  round(CAST(mi_d AS DOUBLE) /
        |    sqrt(CAST(hl_d AS DOUBLE) * CAST(hs_d AS DOUBLE)), 6) AS nmi
        |FROM mi CROSS JOIN hl CROSS JOIN hs""".stripMargin,

    "q197_decayed_activity" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT max(day) AS last_day FROM daily)
        |SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events_30d,
        |  round(CAST(SUM(CAST(n AS DECIMAL(19,0)) *
        |      CAST(power(2, 29 - date_diff('day', day, last_day)) AS BIGINT))
        |    AS DOUBLE) / 536870912.0, 6) AS decayed_count,
        |  round(CAST(SUM(CAST(n AS DECIMAL(19,0)) *
        |      CAST(power(2, 29 - date_diff('day', day, last_day)) AS BIGINT))
        |    AS DOUBLE) / 536870912.0 / CAST(SUM(n) AS DOUBLE), 6) AS recency_ratio
        |FROM daily CROSS JOIN l
        |WHERE date_diff('day', day, last_day) <= 29
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q198_daily_spearman" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS vol,
        |    SUM(CAST(round(value * 100) AS BIGINT)) AS sv
        |  FROM events GROUP BY 1),
        |d2 AS (
        |  SELECT *, CAST(sv AS DOUBLE) / CAST(vol AS DOUBLE) AS mean_val
        |  FROM daily),
        |rk AS (
        |  SELECT
        |    CAST(rank() OVER (ORDER BY vol)
        |      + (COUNT(*) OVER (PARTITION BY vol) - 1) / 2.0
        |      AS DECIMAL(9,1)) AS rv,
        |    CAST(rank() OVER (ORDER BY mean_val)
        |      + (COUNT(*) OVER (PARTITION BY mean_val) - 1) / 2.0
        |      AS DECIMAL(9,1)) AS rm
        |  FROM d2),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(rv) AS sx, SUM(rm) AS sy, SUM(rv*rm) AS sxy,
        |    SUM(rv*rv) AS sxx, SUM(rm*rm) AS syy
        |  FROM rk)
        |SELECT n,
        |  round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
        |         (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS spearman
        |FROM s""".stripMargin,

    "q199_cluster_silhouette" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n0 AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |), vh AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM n0
        |), c0 AS (
        |  SELECT vec_id AS j, v AS c FROM vh
        |  QUALIFY row_number() OVER (ORDER BY vec_id) <= 4
        |), ${Oracles.kmeansIter(1, "c0")},
        |${Oracles.kmeansIter(2, "c1")},
        |af AS (
        |  SELECT vh.vec_id, c2.j, list_dot_product(vh.v, c2.c) AS cos,
        |    row_number() OVER (PARTITION BY vh.vec_id
        |      ORDER BY list_dot_product(vh.v, c2.c) DESC, j) AS rn
        |  FROM vh CROSS JOIN c2
        |), own AS (
        |  SELECT vec_id, j AS cluster, cos AS own_cos FROM af WHERE rn = 1
        |), oth AS (
        |  SELECT vec_id, cos AS other_cos FROM af WHERE rn = 2
        |), sil AS (
        |  SELECT own.vec_id, cluster,
        |    (own_cos - other_cos) / (1.0 - other_cos) AS sil
        |  FROM own JOIN oth USING (vec_id)
        |)
        |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  round(CAST(SUM(CAST(sil AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_silhouette,
        |  round(MIN(sil), 6) AS min_silhouette
        |FROM sil GROUP BY 1 ORDER BY cluster""".stripMargin,

    "q200_theilsen_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    CAST(b.n - a.n AS DOUBLE)
        |      / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |r AS (
        |  SELECT event_type, slope,
        |    row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS m
        |  FROM p),
        |med AS (
        |  SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_pairs,
        |    round(AVG(slope), 6) AS sen_slope
        |  FROM r WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
        |  GROUP BY 1)
        |SELECT event_type, n_pairs, sen_slope,
        |  CASE WHEN sen_slope > 0 THEN 'up'
        |       WHEN sen_slope < 0 THEN 'down' ELSE 'flat' END AS direction
        |FROM med ORDER BY event_type""".stripMargin,

    "q201_bm25_topk" ->
      """WITH qt AS (
        |  SELECT * FROM (VALUES
        |    ('q1', 'spark table join'), ('q2', 'hash merge sort'),
        |    ('q3', 'fast row scan'), ('q4', 'window agg value'))
        |    v(query_id, query_text)),
        |qterms AS (
        |  SELECT query_id, unnest(string_split(query_text, ' ')) AS tok FROM qt),
        |d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |dx AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM d),
        |tf AS (
        |  SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM dx GROUP BY 1, 2, 3),
        |dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(dl1) AS BIGINT) AS tl
        |  FROM (SELECT doc_id, MAX(dl) AS dl1 FROM tf GROUP BY 1)),
        |sc AS (
        |  SELECT query_id, tf.doc_id,
        |    ln((CAST(nd AS DOUBLE) - df + CAST(0.5 AS DOUBLE))
        |        / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) *
        |      (tf * CAST(2.2 AS DOUBLE)) /
        |      (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |        + CAST(0.75 AS DOUBLE) * dl * CAST(nd AS DOUBLE) / tl))
        |      AS part_score
        |  FROM tf JOIN qterms USING (tok) JOIN dfq USING (tok) CROSS JOIN stats),
        |agg AS (
        |  SELECT query_id, doc_id,
        |    round(CAST(SUM(CAST(part_score AS DECIMAL(27,12))) AS DOUBLE), 6)
        |      AS score
        |  FROM sc GROUP BY 1, 2),
        |top AS (
        |  SELECT * FROM agg
        |  QUALIFY row_number()
        |    OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) <= 10)
        |SELECT query_id, doc_id, score FROM top
        |ORDER BY query_id, score DESC, doc_id""".stripMargin,

    "q202_psi_drift" ->
      """WITH binned AS (
        |  SELECT event_type,
        |    CAST(ts AS DATE) <= DATE '2024-01-15' AS first_half,
        |    LEAST(CAST(floor(value / 60) AS BIGINT), 9) AS bin
        |  FROM events),
        |c AS (
        |  SELECT event_type, bin,
        |    CAST(SUM(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN first_half THEN 0 ELSE 1 END) AS BIGINT) AS c2
        |  FROM binned GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type, bin
        |  FROM (SELECT DISTINCT event_type FROM c)
        |  CROSS JOIN (SELECT unnest(range(0, 10)) AS bin)),
        |f AS (
        |  SELECT g.event_type, g.bin,
        |    COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
        |  FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.bin = c.bin),
        |tot AS (
        |  SELECT event_type, SUM(c1) AS n1, SUM(c2) AS n2 FROM f GROUP BY 1),
        |psi AS (
        |  SELECT f.event_type,
        |    CAST(MAX(n1) AS BIGINT) AS n_first,
        |    CAST(MAX(n2) AS BIGINT) AS n_second,
        |    round(CAST(SUM(CAST(
        |      ((c1 + CAST(0.5 AS DOUBLE)) / (n1 + CAST(5.0 AS DOUBLE))
        |        - (c2 + CAST(0.5 AS DOUBLE)) / (n2 + CAST(5.0 AS DOUBLE))) *
        |      ln(((c1 + CAST(0.5 AS DOUBLE)) / (n1 + CAST(5.0 AS DOUBLE)))
        |        / ((c2 + CAST(0.5 AS DOUBLE)) / (n2 + CAST(5.0 AS DOUBLE))))
        |      AS DECIMAL(27,12))) AS DOUBLE), 6) AS psi
        |  FROM f JOIN tot USING (event_type) GROUP BY 1)
        |SELECT event_type, n_first, n_second, psi, psi > 0.1 AS drifted
        |FROM psi ORDER BY event_type""".stripMargin,

    "q203_rand_index" ->
      s"""WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), n0 AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
        |), vh AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) AS v FROM n0
        |), c0 AS (
        |  SELECT vec_id AS j, v AS c FROM vh
        |  QUALIFY row_number() OVER (ORDER BY vec_id) <= 4
        |), ${Oracles.kmeansIter(1, "c0")},
        |${Oracles.kmeansIter(2, "c1")},
        |own AS (
        |  SELECT vh.vec_id, c2.j AS cluster
        |  FROM vh CROSS JOIN c2
        |  QUALIFY row_number() OVER (PARTITION BY vh.vec_id
        |    ORDER BY list_dot_product(vh.v, c2.c) DESC, j) = 1
        |), cont AS (
        |  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS nij
        |  FROM own JOIN embeddings USING (vec_id) GROUP BY 1, 2
        |), cp AS (
        |  SELECT SUM((nij * (nij - 1)) // 2) AS sum_nij2, SUM(nij) AS n,
        |    COUNT(DISTINCT cluster) AS k_clusters,
        |    COUNT(DISTINCT label) AS n_labels
        |  FROM cont
        |), rp AS (
        |  SELECT SUM((ai * (ai - 1)) // 2) AS sum_ai2, SUM(maxj) AS sum_max
        |  FROM (SELECT cluster, SUM(nij) AS ai, MAX(nij) AS maxj
        |        FROM cont GROUP BY 1)
        |), cps AS (
        |  SELECT SUM((bj * (bj - 1)) // 2) AS sum_bj2
        |  FROM (SELECT label, SUM(nij) AS bj FROM cont GROUP BY 1)
        |)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k_clusters AS BIGINT) AS k_clusters,
        |  CAST(n_labels AS BIGINT) AS n_labels,
        |  round((CAST(sum_nij2 AS DOUBLE)
        |      - CAST(sum_ai2 AS DOUBLE) * CAST(sum_bj2 AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * (n - 1) / 2)) /
        |    ((CAST(sum_ai2 AS DOUBLE) + CAST(sum_bj2 AS DOUBLE)) / 2
        |      - CAST(sum_ai2 AS DOUBLE) * CAST(sum_bj2 AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * (n - 1) / 2)), 6) AS ari,
        |  round(CAST(sum_max AS DOUBLE) / CAST(n AS DOUBLE), 6) AS purity
        |FROM cp CROSS JOIN rp CROSS JOIN cps""".stripMargin,

    "q204_funnel_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |fv AS (
        |  SELECT user_id, MIN(us) AS v_us FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, MIN(us - v_us) AS lag_us
        |  FROM ev e JOIN fv USING (user_id)
        |  WHERE event_type = 'purchase' AND us > v_us GROUP BY 1),
        |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers FROM fv),
        |cv AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        |    round(quantile_cont(lag_us, 0.5) / 60000000.0, 6) AS p50_minutes,
        |    round(quantile_cont(lag_us, 0.9) / 60000000.0, 6) AS p90_minutes
        |  FROM conv)
        |SELECT n_viewers, n_converted,
        |  round(CAST(n_converted AS DOUBLE) / CAST(n_viewers AS DOUBLE), 6)
        |    AS conv_rate,
        |  p50_minutes, p90_minutes
        |FROM cv CROSS JOIN nv""".stripMargin,

    "q205_pq_codebooks" ->
      s"""WITH ev AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), ${Oracles.pqSubspace(0)},
        |${Oracles.pqSubspace(1)},
        |${Oracles.pqSubspace(2)},
        |${Oracles.pqSubspace(3)}
        |SELECT * FROM res0 UNION ALL SELECT * FROM res1
        |UNION ALL SELECT * FROM res2 UNION ALL SELECT * FROM res3
        |ORDER BY sub, cluster""".stripMargin,

    "q206_novelty_curve" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^\p{L}\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
        |  FROM documents),
        |f AS (SELECT h, MIN(doc_id) AS first_id FROM d GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM d),
        |per AS (
        |  SELECT CAST((doc_id * 10) // total AS BIGINT) AS decile,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM d JOIN f USING (h) CROSS JOIN nt GROUP BY 1)
        |SELECT decile, n_docs, n_novel,
        |  round(CAST(n_novel AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS novelty_rate
        |FROM per ORDER BY decile""".stripMargin,

    "q207_shuffle_planner" -> shufflePlannerSql,

    "q208_postings_index" ->
      """WITH dx AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)),
        |post AS (
        |  SELECT tok, list(doc_id ORDER BY doc_id) AS postings,
        |    CAST(COUNT(*) AS BIGINT) AS df
        |  FROM dx GROUP BY 1),
        |q AS (
        |  SELECT * FROM (VALUES ('spark', 'table'), ('hash', 'merge'),
        |    ('window', 'value')) v(term_a, term_b))
        |SELECT term_a, term_b, a.df AS df_a, b.df AS df_b,
        |  CAST(len(list_filter(a.postings,
        |    x -> list_contains(b.postings, x))) AS BIGINT) AS n_both,
        |  array_to_string((list_filter(a.postings,
        |    x -> list_contains(b.postings, x)))[1:5], ',') AS top5_docs
        |FROM q
        |JOIN post a ON a.tok = term_a
        |JOIN post b ON b.tok = term_b
        |ORDER BY term_a, term_b""".stripMargin,

    "q209_qoq_growth" ->
      """WITH rev AS (
        |  SELECT n_name AS nation,
        |    date_trunc('quarter', o_orderdate) AS quarter,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT *, lag(rev, 1) OVER (PARTITION BY nation ORDER BY quarter)
        |    AS prev
        |  FROM rev)
        |SELECT nation, quarter, CAST(rev AS DOUBLE) AS revenue,
        |  round((CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
        |    / CAST(prev AS DOUBLE) * 100.0, 6) AS growth_pct
        |FROM lagged ORDER BY nation, quarter""".stripMargin,

    "q210_pq_recall" ->
      s"""WITH ev AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), ${Oracles.pqSubspace(0)},
        |${Oracles.pqSubspace(1)},
        |${Oracles.pqSubspace(2)},
        |${Oracles.pqSubspace(3)},
        |codes AS (
        |  SELECT vec_id, 0 AS sub, j AS code FROM a2_0
        |  UNION ALL SELECT vec_id, 1, j FROM a2_1
        |  UNION ALL SELECT vec_id, 2, j FROM a2_2
        |  UNION ALL SELECT vec_id, 3, j FROM a2_3
        |), qd AS (
        |${Seq(0, 1, 2, 3).map(s =>
          s"""  SELECT q.vec_id AS query_id, $s AS sub, c.j,
             |    list_dot_product(q.x, q.x) - 2.0 * list_dot_product(q.x, c.c)
             |      + list_dot_product(c.c, c.c) AS qd2
             |  FROM xs$s q CROSS JOIN c1_$s c WHERE q.vec_id < 20""".stripMargin)
          .mkString("\n  UNION ALL\n")}
        |), ad AS (
        |  SELECT query_id, c.vec_id,
        |    round(CAST(SUM(CAST(qd2 AS DECIMAL(27,12))) AS DOUBLE), 6) AS ad2
        |  FROM codes c JOIN qd ON c.sub = qd.sub AND c.code = qd.j
        |  WHERE c.vec_id <> qd.query_id
        |  GROUP BY 1, 2
        |), approx AS (
        |  SELECT query_id, vec_id FROM ad
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY ad2, vec_id) <= 10
        |), exd AS (
        |  SELECT q.vec_id AS query_id, x.vec_id,
        |    list_dot_product(x.v, x.v) - 2.0 * list_dot_product(x.v, q.v)
        |      + list_dot_product(q.v, q.v) AS d2e
        |  FROM ev x CROSS JOIN ev q
        |  WHERE q.vec_id < 20 AND x.vec_id <> q.vec_id
        |), exact AS (
        |  SELECT query_id, vec_id FROM exd
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY d2e, vec_id) <= 10
        |), ov AS (
        |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        |  FROM approx JOIN exact USING (query_id, vec_id) GROUP BY 1
        |), ql AS (SELECT vec_id AS query_id FROM ev WHERE vec_id < 20)
        |SELECT query_id,
        |  CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap,
        |  round(CAST(COALESCE(n_overlap, 0) AS DOUBLE) / 10.0, 6)
        |    AS recall_at_10
        |FROM ql LEFT JOIN ov USING (query_id) ORDER BY query_id""".stripMargin,

    "q211_threshold_curve" ->
      s"""WITH RECURSIVE ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |),
        |${Seq(("a", "0.5"), ("b", "0.7")).map { case (sfx, t) =>
          s"""kept_$sfx AS (SELECT id_a, id_b FROM pj WHERE j >= $t),
             |edges_$sfx AS (
             |  SELECT id_a AS a, id_b AS b FROM kept_$sfx
             |  UNION SELECT id_b, id_a FROM kept_$sfx
             |), reach_$sfx(node, r) AS (
             |  SELECT a, a FROM edges_$sfx
             |  UNION
             |  SELECT e.a, re.r FROM edges_$sfx e JOIN reach_$sfx re ON re.node = e.b
             |), comp_$sfx AS (
             |  SELECT node, min(r) AS comp FROM reach_$sfx GROUP BY node
             |), sizes_$sfx AS (
             |  SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz FROM comp_$sfx GROUP BY 1
             |), row_$sfx AS (
             |  SELECT CAST($t AS DOUBLE) AS threshold,
             |    (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_$sfx) AS n_pairs,
             |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
             |    CAST(MAX(sz) AS BIGINT) AS largest_cluster,
             |    CAST(SUM(sz - 1) AS BIGINT) AS n_dropped
             |  FROM sizes_$sfx)""".stripMargin
        }.mkString(",\n")}
        |SELECT * FROM row_a UNION ALL SELECT * FROM row_b
        |ORDER BY threshold""".stripMargin,

    "q212_top_movers" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) <= DATE '2024-01-15' AS h1
        |  FROM events),
        |ca AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ev WHERE h1 GROUP BY 1),
        |cb AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM ev WHERE NOT h1 GROUP BY 1),
        |ta AS (
        |  SELECT user_id, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rk
        |  FROM ca QUALIFY rk <= 50),
        |tb AS (
        |  SELECT user_id, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rk
        |  FROM cb QUALIFY rk <= 50)
        |SELECT user_id,
        |  COALESCE(a.n, 0) AS n_first, COALESCE(b.n, 0) AS n_second,
        |  COALESCE(a.rk, 51) AS rk_first, COALESCE(b.rk, 51) AS rk_second,
        |  COALESCE(a.rk, 51) - COALESCE(b.rk, 51) AS rank_change
        |FROM ta a FULL JOIN tb b USING (user_id)
        |ORDER BY rank_change DESC, user_id""".stripMargin,

    "q213_substring_dup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') tk FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) >= 5
        |      THEN list_transform(range(1, len(tk) - 3),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |             tk[i+3] || ' ' || tk[i+4])
        |      ELSE [] END) AS sg
        |  FROM t
        |), g AS (
        |  SELECT doc_id, md5(unnest(sg)) AS gh FROM sh
        |), df AS (
        |  SELECT gh, CAST(COUNT(*) AS BIGINT) AS nd FROM g GROUP BY 1
        |), per AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS g_all,
        |    CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS g_dup
        |  FROM g JOIN df USING (gh) GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  COALESCE(g_all, 0) AS n_grams,
        |  COALESCE(g_dup, 0) AS n_dup_grams,
        |  round(CASE WHEN COALESCE(g_all, 0) > 0
        |    THEN CAST(g_dup AS DOUBLE) / CAST(g_all AS DOUBLE)
        |    ELSE 0.0 END, 6) AS dup_frac
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q214_kcenter_coreset" -> Oracles.kcenterSql,

    "q215_interval_merge" ->
      """WITH iv AS (
        |  SELECT l_suppkey, CAST(o_orderdate AS DATE) AS s,
        |    CAST(l_shipdate AS DATE) AS e, l_orderkey, l_linenumber
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), fl AS (
        |  SELECT l_suppkey, s, e, l_orderkey, l_linenumber,
        |    max(e) OVER (PARTITION BY l_suppkey
        |      ORDER BY s, e, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM iv
        |), fi AS (
        |  SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
        |  FROM fl
        |), isl0 AS (
        |  SELECT *, SUM(ni) OVER (PARTITION BY l_suppkey
        |    ORDER BY s, e, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM fi
        |), isl AS (
        |  SELECT l_suppkey, island, min(s) AS ms, max(e) AS me,
        |    CAST(COUNT(*) AS BIGINT) AS n_iv
        |  FROM isl0 GROUP BY 1, 2
        |)
        |SELECT l_suppkey,
        |  CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(date_diff('day', ms, me) + 1) AS BIGINT) AS covered_days,
        |  CAST(date_diff('day', MIN(ms), MAX(me)) + 1 AS BIGINT) AS span_days,
        |  round(CAST(SUM(date_diff('day', ms, me) + 1) AS DOUBLE)
        |    / CAST(date_diff('day', MIN(ms), MAX(me)) + 1 AS DOUBLE), 6)
        |    AS busy_frac
        |FROM isl GROUP BY 1 ORDER BY 1""".stripMargin,

    "q216_weighted_median" ->
      """WITH pw AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS price,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS wd
        |  FROM lineitem GROUP BY 1, 2
        |), tot AS (
        |  SELECT flag, SUM(wd) AS wt, CAST(COUNT(*) AS BIGINT) AS n_prices
        |  FROM pw GROUP BY 1
        |), cum AS (
        |  SELECT flag, price, SUM(wd) OVER (PARTITION BY flag ORDER BY price
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        |  FROM pw
        |), med AS (
        |  SELECT flag, MIN(price) AS w_median
        |  FROM cum JOIN tot USING (flag) WHERE cw * 2 >= wt GROUP BY 1
        |)
        |SELECT flag, n_prices, CAST(wt AS DOUBLE) AS total_qty, w_median
        |FROM tot JOIN med USING (flag) ORDER BY flag""".stripMargin,

    "q217_kmv_distinct" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
        |), hs AS (
        |  SELECT DISTINCT source,
        |    CAST(CAST(md5_number_upper(tok) AS HUGEINT)
        |      % 2305843009213693951 AS BIGINT) AS h
        |  FROM tok
        |), kept AS (
        |  SELECT source, h FROM hs
        |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 32
        |), mk AS (
        |  SELECT h FROM (SELECT DISTINCT h FROM kept)
        |  QUALIFY row_number() OVER (ORDER BY h) <= 32
        |), est AS (
        |  SELECT source,
        |    CASE WHEN n_k < 32 THEN CAST(n_k AS DOUBLE)
        |      ELSE 31.0 * CAST(2305843009213693951 AS DOUBLE)
        |        / CAST(kth AS DOUBLE) END AS e
        |  FROM (
        |    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_k, MAX(h) AS kth
        |    FROM kept GROUP BY 1
        |    UNION ALL
        |    SELECT '__all__', CAST(COUNT(*) AS BIGINT), MAX(h) FROM mk)
        |), ex AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact FROM hs GROUP BY 1
        |  UNION ALL
        |  SELECT '__all__', CAST(COUNT(DISTINCT h) AS BIGINT) FROM hs
        |)
        |SELECT source, n_exact, round(e, 6) AS kmv_est,
        |  round(abs(e - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6)
        |    AS rel_err
        |FROM est JOIN ex USING (source) ORDER BY source""".stripMargin,

    "q218_dup_bfs" ->
      s"""WITH RECURSIVE ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), kept AS (
        |  SELECT id_a, id_b FROM pj WHERE j >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM kept
        |  UNION ALL SELECT id_b, id_a FROM kept
        |), reach(node, d) AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) FROM documents WHERE doc_id < 10
        |  UNION
        |  SELECT e.b, r.d + 1 FROM reach r JOIN edges e ON e.a = r.node
        |  WHERE r.d < 4
        |)
        |SELECT node AS doc_id, CAST(MIN(d) AS BIGINT) AS hops
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "q219_water_filling" ->
      """WITH counts AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS t
        |  FROM (SELECT source, unnest(string_split(text, ' ')) FROM documents)
        |  GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(t) AS BIGINT) AS total,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(FLOOR(CAST(SUM(t) AS DOUBLE) / 2.0) AS BIGINT) AS budget
        |  FROM counts
        |), ranked AS (
        |  SELECT source, t,
        |    CAST(row_number() OVER (ORDER BY t, source) AS BIGINT) AS r,
        |    CAST(COALESCE(SUM(t) OVER (ORDER BY t, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS p
        |  FROM counts
        |), cand AS (
        |  SELECT source, t, r,
        |    CAST(budget - p AS DOUBLE) / CAST(n - r + 1 AS DOUBLE) AS cand
        |  FROM ranked CROSS JOIN tot
        |), pv AS (
        |  SELECT r AS pr, cand AS lvl FROM cand
        |  WHERE cand <= CAST(t AS DOUBLE) ORDER BY r LIMIT 1
        |)
        |SELECT source, t AS tokens,
        |  round(CASE WHEN r < pr THEN CAST(t AS DOUBLE) ELSE lvl END, 6)
        |    AS alloc,
        |  r < pr AS funded_fully
        |FROM cand CROSS JOIN pv ORDER BY source""".stripMargin,

    "q220_shapley_attribution" -> Oracles.shapleySql,

    "q221_roc_auc" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |vg AS (
        |  SELECT value, CAST(COUNT(*) AS BIGINT) AS nv FROM ev GROUP BY 1
        |), vgc AS (
        |  SELECT value, nv,
        |    CAST(COALESCE(SUM(nv) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb
        |  FROM vg
        |), tv AS (
        |  SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS np
        |  FROM ev GROUP BY 1, 2
        |), tot AS (SELECT CAST(SUM(nv) AS BIGINT) AS ntot FROM vg),
        |per AS (
        |  SELECT event_type,
        |    SUM(CAST(np AS HUGEINT) * CAST(2 * cb + nv + 1 AS HUGEINT)) AS r2,
        |    CAST(SUM(np) AS BIGINT) AS p
        |  FROM tv JOIN vgc USING (value) GROUP BY 1
        |)
        |SELECT event_type, p AS n_pos, ntot - p AS n_neg,
        |  round(CAST(r2 - CAST(p AS HUGEINT) * CAST(p + 1 AS HUGEINT)
        |      AS DOUBLE)
        |    / CAST(CAST(2 AS HUGEINT) * CAST(p AS HUGEINT)
        |      * CAST(ntot - p AS HUGEINT) AS DOUBLE), 6) AS auc
        |FROM per CROSS JOIN tot ORDER BY event_type""".stripMargin,

    "q222_bpe_pairs" ->
      """WITH wf AS (
        |  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) >= 2 GROUP BY 1
        |), pc AS (
        |  SELECT substring(word, CAST(i AS INTEGER), 2) AS pr,
        |    CAST(SUM(f) AS BIGINT) AS total
        |  FROM wf, LATERAL unnest(range(1, length(word))) AS t(i)
        |  GROUP BY 1
        |)
        |SELECT pr AS pair, total FROM pc
        |QUALIFY row_number() OVER (ORDER BY total DESC, pr) <= 20
        |ORDER BY total DESC, pair""".stripMargin,

    "q223_conformal_coverage" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    (CAST(md5_number_upper(CAST(event_id AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 1000 < 500 AS is_cal
        |  FROM events
        |), cg AS (
        |  SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM ev WHERE is_cal GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, value,
        |    SUM(nv) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        |  FROM cg
        |), ncal AS (
        |  SELECT event_type, CAST(SUM(nv) AS BIGINT) AS n_cal,
        |    CAST((9 * (SUM(nv) + 1) + 9) // 10 AS BIGINT) AS k
        |  FROM cg GROUP BY 1
        |), qh AS (
        |  SELECT event_type, MIN(value) AS qhat
        |  FROM cum JOIN ncal USING (event_type) WHERE cw >= k GROUP BY 1
        |)
        |SELECT event_type, n_cal,
        |  CAST(COUNT(*) AS BIGINT) AS n_test, qhat,
        |  round(CAST(SUM(CASE WHEN value <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
        |FROM ev JOIN qh USING (event_type) JOIN ncal USING (event_type)
        |WHERE NOT is_cal
        |GROUP BY event_type, n_cal, qhat
        |ORDER BY event_type""".stripMargin,

    "q224_loo_influence" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(SUM(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
        |      AS HUGEINT) AS ss
        |  FROM documents GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS HUGEINT) AS st,
        |    CAST(SUM(ss) AS HUGEINT) AS sst
        |  FROM per
        |)
        |SELECT source, n AS n_docs,
        |  round((CAST(st - s AS DOUBLE) / CAST(nt - n AS DOUBLE))
        |    - (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)), 6) AS mean_delta,
        |  round((CAST(sst - ss AS DOUBLE) / CAST(nt - n AS DOUBLE)
        |      - (CAST(st - s AS DOUBLE) / CAST(nt - n AS DOUBLE))
        |        * (CAST(st - s AS DOUBLE) / CAST(nt - n AS DOUBLE)))
        |    - (CAST(sst AS DOUBLE) / CAST(nt AS DOUBLE)
        |      - (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))
        |        * (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))), 6) AS var_delta
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,

    "q225_rrf_fusion" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e
        |), sq AS (SELECT * FROM n WHERE vec_id < 5),
        |sp AS (
        |  SELECT sq.vec_id AS query_id, c.vec_id AS doc_id,
        |    list_dot_product(sq.v, c.v) / (sq.nrm * c.nrm) AS cosine
        |  FROM sq, n c WHERE c.vec_id <> sq.vec_id
        |), sem AS (
        |  SELECT query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, doc_id) AS BIGINT) AS r_sem
        |  FROM sp QUALIFY r_sem <= 10
        |), d AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN length(text) >= 3
        |      THEN list_transform(range(1, length(text) - 1),
        |        i -> substring(text, CAST(i AS INTEGER), 3))
        |      ELSE [] END) AS g3
        |  FROM documents
        |), lq AS (SELECT doc_id AS query_id, g3 AS qg FROM d WHERE doc_id < 5),
        |lp AS (
        |  SELECT lq.query_id, d.doc_id,
        |    CAST(len(list_intersect(lq.qg, d.g3)) AS DOUBLE)
        |      / CAST(len(list_distinct(lq.qg || d.g3)) AS DOUBLE) AS j
        |  FROM lq, d WHERE d.doc_id <> lq.query_id
        |), lex AS (
        |  SELECT query_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY j DESC, doc_id) AS BIGINT) AS r_lex
        |  FROM lp QUALIFY r_lex <= 10
        |), fused AS (
        |  SELECT query_id, doc_id, r_lex, r_sem,
        |    COALESCE(1.0 / (60.0 + CAST(r_lex AS DOUBLE)), 0.0)
        |      + COALESCE(1.0 / (60.0 + CAST(r_sem AS DOUBLE)), 0.0) AS rrf
        |  FROM lex FULL JOIN sem USING (query_id, doc_id)
        |)
        |SELECT query_id,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
        |  doc_id, r_lex, r_sem, round(rrf, 6) AS rrf
        |FROM fused QUALIFY rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q226_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |), pg AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    md5(array_to_string(tk[i:i+4], ' ')) AS gh
        |  FROM t, LATERAL unnest(range(1, len(tk) - 3)) AS u(i)
        |  WHERE len(tk) >= 5
        |), df AS (
        |  SELECT gh, CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM (SELECT DISTINCT doc_id, gh FROM pg) GROUP BY 1
        |), dp AS (
        |  SELECT doc_id, pos FROM pg JOIN df USING (gh) WHERE nd >= 2
        |), runs AS (
        |  SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |    FROM dp)
        |  GROUP BY 1, 2
        |), rs AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
        |    CAST(MAX(len) AS BIGINT) AS longest_run
        |  FROM runs GROUP BY 1
        |), cov AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS removable_tokens
        |  FROM (SELECT DISTINCT doc_id, CAST(ti AS BIGINT) AS ti
        |    FROM dp, LATERAL unnest(range(pos, pos + 5)) AS u(ti))
        |  GROUP BY 1
        |), np AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pos FROM pg GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  COALESCE(n_pos, 0) AS n_pos,
        |  COALESCE(n_runs, 0) AS n_runs,
        |  COALESCE(longest_run, 0) AS longest_run,
        |  COALESCE(removable_tokens, 0) AS removable_tokens
        |FROM documents d LEFT JOIN np USING (doc_id)
        |LEFT JOIN rs USING (doc_id) LEFT JOIN cov USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q227_label_mmd" ->
      """WITH e AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), x AS (
        |  SELECT label, unnest(v) AS comp, generate_subscripts(v, 1) AS pos
        |  FROM e
        |), cm AS (
        |  SELECT label, pos,
        |    CAST(SUM(CAST(comp AS DECIMAL(27,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS m
        |  FROM x GROUP BY 1, 2
        |), cent AS (
        |  SELECT label, list(m ORDER BY pos) AS c FROM cm GROUP BY 1
        |)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  round(list_dot_product(a.c, a.c) - 2.0 * list_dot_product(a.c, b.c)
        |    + list_dot_product(b.c, b.c), 6) AS mmd2
        |FROM cent a JOIN cent b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,

    "q228_scd2_asof" ->
      """WITH h AS (
        |  SELECT user_id, event_id,
        |    epoch_us(ts) AS valid_from_us,
        |    COALESCE(epoch_us(lead(ts) OVER w), 253402214400000000)
        |      AS valid_to_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT user_id, event_id, valid_from_us FROM h
        |WHERE valid_from_us <= 1705276800000000
        |  AND valid_to_us > 1705276800000000
        |ORDER BY user_id""".stripMargin,

    "q229_kendall_tau" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS y
        |  FROM events GROUP BY 1
        |), pairs AS (
        |  SELECT CAST(SUM(CASE WHEN sign(CAST(b.x - a.x AS DOUBLE))
        |      * sign(CAST(b.y - a.y AS DOUBLE)) = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS concordant,
        |    CAST(SUM(CASE WHEN sign(CAST(b.x - a.x AS DOUBLE))
        |      * sign(CAST(b.y - a.y AS DOUBLE)) = -1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS discordant
        |  FROM daily a JOIN daily b ON a.d < b.d
        |), n AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
        |    COUNT(*) * (COUNT(*) - 1) / 2 AS n0
        |  FROM daily
        |), t1 AS (
        |  SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS n1
        |  FROM (SELECT COUNT(*) AS c FROM daily GROUP BY x)
        |), t2 AS (
        |  SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS n2
        |  FROM (SELECT COUNT(*) AS c FROM daily GROUP BY y)
        |)
        |SELECT nd AS n_days, concordant, discordant,
        |  round(CAST(concordant - discordant AS DOUBLE)
        |    / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE)), 6)
        |    AS tau_b
        |FROM pairs CROSS JOIN n CROSS JOIN t1 CROSS JOIN t2""".stripMargin,

    "q230_grouped_ols" ->
      """WITH rev AS (
        |  SELECT n_name AS nation,
        |    CAST(year(date_trunc('quarter', o_orderdate)) * 4
        |      + quarter(date_trunc('quarter', o_orderdate)) AS BIGINT) AS x,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, date_trunc('quarter', o_orderdate)
        |), sums AS (
        |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    SUM(rev) AS sy,
        |    SUM(CAST(rev AS DECIMAL(18,2)) * CAST(x AS DECIMAL(6,0))) AS sxy
        |  FROM rev GROUP BY 1
        |)
        |SELECT nation, n AS n_quarters,
        |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0 THEN
        |    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / CAST(n * sxx - sx * sx AS DOUBLE), 6)
        |  ELSE NULL END AS slope,
        |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0 THEN
        |    round(((CAST(sy AS DOUBLE)
        |      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE)) / 1000000.0, 6)
        |  ELSE NULL END AS intercept_m
        |FROM sums ORDER BY nation""".stripMargin,

    "q231_heaps_fit" ->
      """WITH nmax AS (
        |  SELECT CAST(MAX(doc_id) + 1 AS DOUBLE) AS nd FROM documents
        |), toks AS (
        |  SELECT CAST(floor(CAST(doc_id AS DOUBLE) * 10.0 / nd) AS BIGINT)
        |      AS decile,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents CROSS JOIN nmax
        |), pd AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY decile
        |), fs AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
        |    SELECT tok, MIN(decile) AS decile FROM toks GROUP BY tok)
        |  GROUP BY decile
        |), cum AS (
        |  SELECT pd.decile,
        |    CAST(SUM(pd.n_tokens)
        |      OVER (ORDER BY pd.decile ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS ct,
        |    CAST(SUM(COALESCE(fs.n_new, 0))
        |      OVER (ORDER BY pd.decile ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cv
        |  FROM pd LEFT JOIN fs USING (decile)
        |), xy AS (
        |  SELECT round(ln(CAST(ct AS DOUBLE)), 9) AS x,
        |    round(ln(CAST(cv AS DOUBLE)), 9) AS y
        |  FROM cum
        |), m AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x * y AS DECIMAL(27,12))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(27,12))) AS DOUBLE) AS sy
        |  FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS heaps_beta,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0
        |    AS ln_k
        |FROM m""".stripMargin,

    "q232_source_jsd" ->
      """WITH tok AS (
        |  SELECT source,
        |    CAST((CAST(md5_number_upper(tok) AS HUGEINT)
        |      % 2305843009213693951) % 256 AS BIGINT) AS b
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |), counts AS (
        |  SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2
        |), totals AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM counts GROUP BY 1
        |), grid AS (
        |  SELECT totals.source, gb.b,
        |    CAST(COALESCE(c, 0) + 1 AS DOUBLE) / CAST(t + 256 AS DOUBLE) AS p
        |  FROM totals CROSS JOIN (SELECT unnest(range(0, 256)) AS b) gb
        |  LEFT JOIN counts ON counts.source = totals.source
        |    AND counts.b = gb.b
        |)
        |SELECT a.source AS source_a, b2.source AS source_b,
        |  round(CAST(SUM(CAST(
        |    0.5 * (a.p * ln(a.p / ((a.p + b2.p) / 2.0)))
        |      + 0.5 * (b2.p * ln(b2.p / ((a.p + b2.p) / 2.0)))
        |    AS DECIMAL(27,12))) AS DOUBLE), 6) AS jsd
        |FROM grid a JOIN grid b2 ON a.b = b2.b AND a.source < b2.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q233_exp_ks_fit" ->
      """WITH g AS (
        |  SELECT epoch_us(ts)
        |    - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS g
        |  FROM events
        |  QUALIFY g IS NOT NULL
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(g) AS BIGINT) AS s
        |  FROM g
        |), grain AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(COUNT(*)) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM g GROUP BY g
        |), d AS (
        |  SELECT n, s,
        |    greatest(
        |      abs(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
        |        - (1.0 - exp(-(CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
        |          * CAST(g AS DOUBLE)))),
        |      abs(CAST(cum - ng AS DOUBLE) / CAST(n AS DOUBLE)
        |        - (1.0 - exp(-(CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
        |          * CAST(g AS DOUBLE))))) AS dd
        |  FROM grain CROSS JOIN tot
        |)
        |SELECT n AS n_gaps,
        |  round(CAST(n AS DOUBLE) / CAST(s AS DOUBLE) * 3600000000.0, 6)
        |    AS lambda_per_hour,
        |  round(MAX(dd), 6) AS ks_d
        |FROM d GROUP BY n, s""".stripMargin,

    "q234_dup_assortativity" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), kept AS (
        |  SELECT id_a, id_b FROM pj WHERE j >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM kept
        |  UNION ALL SELECT id_b, id_a FROM kept
        |), deg AS (
        |  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM edges GROUP BY 1
        |), dec AS (
        |  SELECT da.deg AS dx, db.deg AS dy
        |  FROM edges JOIN deg da ON da.node = edges.a
        |  JOIN deg db ON db.node = edges.b
        |), mm AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(CAST(dx AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(dy AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS HUGEINT)
        |      AS sxx,
        |    CAST(SUM(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS HUGEINT)
        |      AS syy,
        |    CAST(SUM(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS HUGEINT)
        |      AS sxy
        |  FROM dec
        |)
        |SELECT CAST(m / 2 AS BIGINT) AS n_edges,
        |  round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    AS assortativity
        |FROM mm""".stripMargin,

    "q235_fd_binning" ->
      """WITH grain AS (
        |  SELECT value, CAST(COUNT(*) AS BIGINT) AS nv,
        |    CAST(SUM(COUNT(*)) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM events GROUP BY value
        |), tot AS (
        |  SELECT CAST(SUM(nv) AS BIGINT) AS n, MIN(value) AS vmin,
        |    MAX(value) AS vmax,
        |    CAST((SUM(nv) + 3) // 4 AS BIGINT) AS k25,
        |    CAST((3 * SUM(nv) + 3) // 4 AS BIGINT) AS k75
        |  FROM grain
        |), p25 AS (
        |  SELECT MIN(value) AS q25 FROM grain CROSS JOIN tot WHERE cum >= k25
        |), p75 AS (
        |  SELECT MIN(value) AS q75 FROM grain CROSS JOIN tot WHERE cum >= k75
        |)
        |SELECT n AS n_rows, vmin, vmax,
        |  round(q75 - q25, 6) AS iqr,
        |  round(2.0 * (q75 - q25) * exp(-ln(CAST(n AS DOUBLE)) / 3.0), 6)
        |    AS fd_width,
        |  CAST(ceil((vmax - vmin)
        |    / (2.0 * (q75 - q25) * exp(-ln(CAST(n AS DOUBLE)) / 3.0)))
        |    AS BIGINT) AS fd_bins,
        |  CAST(ceil(ln(CAST(n AS DOUBLE)) / ln(2.0)) AS BIGINT) + 1
        |    AS sturges_bins
        |FROM tot CROSS JOIN p25 CROSS JOIN p75""".stripMargin,

    "q236_distinct_n" -> Oracles.distinctNSql,

    "q237_mann_whitney" ->
      """WITH ev AS (
        |  SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isa
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |), grain AS (
        |  SELECT value, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(isa) AS BIGINT) AS na,
        |    CAST(SUM(COUNT(*)) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM ev GROUP BY value
        |), s AS (
        |  SELECT CAST(SUM(na) AS BIGINT) AS n_a,
        |    CAST(SUM(n - na) AS BIGINT) AS n_b,
        |    CAST(SUM(CAST(na AS HUGEINT)
        |      * (2 * CAST(cum AS HUGEINT) - n + 1)) AS HUGEINT) AS two_r_a,
        |    CAST(SUM(CAST(n AS HUGEINT) * n * n - n) AS HUGEINT) AS tie_term
        |  FROM grain
        |), u AS (
        |  SELECT n_a, n_b,
        |    two_r_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS two_u,
        |    tie_term, n_a + n_b AS nn
        |  FROM s
        |)
        |SELECT n_a, n_b, CAST(two_u AS BIGINT) AS two_u_a,
        |  CAST(tie_term AS BIGINT) AS tie_term,
        |  round((CAST(two_u AS DOUBLE) / 2.0
        |      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |      * ((CAST(nn AS DOUBLE) + 1.0)
        |        - CAST(tie_term AS DOUBLE)
        |          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))), 6)
        |    AS z_score,
        |  round((CAST(two_u AS DOUBLE)
        |      - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS cliffs_delta
        |FROM u""".stripMargin,

    "q238_wilson_rank" ->
      """WITH agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pass
        |  FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, n_docs, n_pass,
        |    round((CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |        + 3.8416 / (2.0 * CAST(n_docs AS DOUBLE))
        |        - 1.96 * sqrt(CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |            * (1.0 - CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE))
        |            / CAST(n_docs AS DOUBLE)
        |          + 3.8416 / (4.0 * CAST(n_docs AS DOUBLE)
        |            * CAST(n_docs AS DOUBLE))))
        |      / (1.0 + 3.8416 / CAST(n_docs AS DOUBLE)), 6) AS wilson_lb
        |  FROM agg
        |)
        |SELECT source, n_docs, n_pass, wilson_lb,
        |  CAST(row_number() OVER (ORDER BY wilson_lb DESC, source) AS BIGINT)
        |    AS rnk
        |FROM w ORDER BY rnk""".stripMargin,

    "q239_katz_centrality" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), kept AS (
        |  SELECT id_a, id_b FROM pj WHERE j >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM kept
        |  UNION ALL SELECT id_b, id_a FROM kept
        |), w1 AS (
        |  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS w1
        |  FROM edges GROUP BY 1
        |), w2 AS (
        |  SELECT e.a AS node, CAST(SUM(w1.w1) AS BIGINT) AS w2
        |  FROM edges e JOIN w1 ON w1.node = e.b GROUP BY 1
        |), w3 AS (
        |  SELECT e.a AS node, CAST(SUM(w2.w2) AS BIGINT) AS w3
        |  FROM edges e JOIN w2 ON w2.node = e.b GROUP BY 1
        |)
        |SELECT w1.node AS doc_id, w1.w1, w2.w2, w3.w3,
        |  CAST(w1.w1 * 100 + w2.w2 * 10 + w3.w3 AS BIGINT) AS katz_x1000
        |FROM w1 JOIN w2 ON w2.node = w1.node JOIN w3 ON w3.node = w1.node
        |ORDER BY doc_id""".stripMargin,

    "q240_kruskal_wallis" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
        |), pv AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS n_v FROM ev GROUP BY v
        |), cumt AS (
        |  SELECT v, n_v,
        |    CAST(SUM(n_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM pv
        |), gv AS (
        |  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS n_gv
        |  FROM ev GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type, CAST(SUM(n_gv) AS BIGINT) AS n_g,
        |    CAST(SUM(n_gv * (2 * cum - n_v + 1)) AS BIGINT) AS two_r
        |  FROM gv JOIN cumt USING (v) GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(n_v) AS BIGINT) AS n_tot,
        |    CAST(SUM(n_v * n_v * n_v - n_v) AS BIGINT) AS tie_term
        |  FROM pv
        |), terms AS (
        |  SELECT event_type, n_g, two_r,
        |    CAST(round(CAST(two_r AS DOUBLE) * CAST(two_r AS DOUBLE)
        |      / (4.0 * CAST(n_g AS DOUBLE)), 6) AS DECIMAL(38,6)) AS term
        |  FROM g
        |), hs AS (
        |  SELECT SUM(term) AS sum_terms FROM terms
        |)
        |SELECT event_type, n_g, two_r,
        |  round(CAST(two_r AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE)), 6)
        |    AS mean_rank,
        |  round(12.0 / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0))
        |      * CAST(sum_terms AS DOUBLE)
        |      - 3.0 * (CAST(n_tot AS DOUBLE) + 1.0), 6) AS h_stat,
        |  round((12.0 / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0))
        |      * CAST(sum_terms AS DOUBLE)
        |      - 3.0 * (CAST(n_tot AS DOUBLE) + 1.0))
        |    / (1.0 - CAST(tie_term AS DOUBLE)
        |      / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
        |        * CAST(n_tot AS DOUBLE) - CAST(n_tot AS DOUBLE))), 6)
        |    AS h_corr
        |FROM terms CROSS JOIN hs CROSS JOIN tot
        |ORDER BY event_type""".stripMargin,

    "q241_brown_forsythe" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events
        |), grain AS (
        |  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS n_gv
        |  FROM ev GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, v, n_gv,
        |    CAST(SUM(n_gv) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM grain
        |), ng AS (
        |  SELECT event_type, CAST(SUM(n_gv) AS BIGINT) AS n_g
        |  FROM grain GROUP BY 1
        |), med AS (
        |  SELECT c.event_type, MIN(c.v) AS med
        |  FROM cum c JOIN ng ON ng.event_type = c.event_type
        |  WHERE c.cum * 2 >= ng.n_g GROUP BY 1
        |), z AS (
        |  SELECT ev.event_type,
        |    CAST(abs(ev.v - med.med) AS DECIMAL(18,2)) AS z
        |  FROM ev JOIN med ON med.event_type = ev.event_type
        |), gs AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(z) AS DECIMAL(38,2)) AS s1,
        |    CAST(SUM(CAST(z * z AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2
        |  FROM z GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot,
        |    CAST(SUM(s1) AS DECIMAL(38,2)) AS s1_tot,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM gs
        |), parts AS (
        |  SELECT gs.event_type, gs.n_g, med.med,
        |    round(CAST(s1 AS DOUBLE) / CAST(gs.n_g AS DOUBLE), 6)
        |      AS mean_absdev,
        |    CAST(round(CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        / CAST(gs.n_g AS DOUBLE), 6) AS DECIMAL(38,6)) AS ssw_t,
        |    CAST(round(CAST(gs.n_g AS DOUBLE)
        |      * (CAST(s1 AS DOUBLE) / CAST(gs.n_g AS DOUBLE)
        |        - CAST(s1_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(gs.n_g AS DOUBLE)
        |        - CAST(s1_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)), 6)
        |      AS DECIMAL(38,6)) AS ssb_t,
        |    n_tot, k
        |  FROM gs JOIN med ON med.event_type = gs.event_type
        |  CROSS JOIN tot
        |), fagg AS (
        |  SELECT SUM(ssw_t) AS ssw, SUM(ssb_t) AS ssb FROM parts
        |)
        |SELECT event_type, n_g, CAST(med AS DOUBLE) AS group_median,
        |  mean_absdev,
        |  round(CAST(ssw AS DOUBLE), 6) AS ssw,
        |  round(CAST(ssb AS DOUBLE), 6) AS ssb,
        |  round((CAST(ssb AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
        |    / (CAST(ssw AS DOUBLE)
        |      / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat
        |FROM parts CROSS JOIN fagg
        |ORDER BY event_type""".stripMargin,

    "q242_mcnemar" ->
      """WITH d AS (
        |  SELECT (n_chars >= 300) AS ga,
        |    (len(string_split(text, ' ')) >= 52) AS gb
        |  FROM documents
        |), s AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n11,
        |    CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n10,
        |    CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n01,
        |    CAST(SUM(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00
        |  FROM d
        |)
        |SELECT n11, n10, n01, n00,
        |  CASE WHEN n10 + n01 > 0 THEN
        |    round((CAST(n10 AS DOUBLE) - n01) * (CAST(n10 AS DOUBLE) - n01)
        |      / (CAST(n10 AS DOUBLE) + n01), 6) END AS chi2,
        |  CASE WHEN n10 + n01 > 0 THEN
        |    round((abs(CAST(n10 AS DOUBLE) - n01) - 1.0)
        |      * (abs(CAST(n10 AS DOUBLE) - n01) - 1.0)
        |      / (CAST(n10 AS DOUBLE) + n01), 6) END AS chi2_cc,
        |  CASE WHEN n01 > 0 THEN
        |    round(CAST(n10 AS DOUBLE) / CAST(n01 AS DOUBLE), 6) END
        |    AS discordant_ratio
        |FROM s""".stripMargin,

    "q243_kneser_ney" ->
      """WITH tk AS (
        |  SELECT string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), pos AS MATERIALIZED (
        |  SELECT unnest(l, recursive := true)
        |  FROM (SELECT list_transform(range(1, len(tk)),
        |          i -> struct_pack(w1 := tk[i], w2 := tk[i+1])) AS l
        |        FROM tk)
        |), cb AS MATERIALIZED (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM pos GROUP BY w1, w2
        |), cpre AS (
        |  SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu,
        |    CAST(COUNT(*) AS BIGINT) AS n1fw
        |  FROM cb GROUP BY w1
        |), cbw AS (
        |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bw FROM cb GROUP BY w2
        |), tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM cb)
        |SELECT w1, w2, cb, cu, n1fw, n1bw,
        |  round(greatest(CAST(cb AS DOUBLE) - 0.75, 0.0)
        |      / CAST(cu AS DOUBLE)
        |    + 0.75 * (CAST(n1fw AS DOUBLE) / CAST(cu AS DOUBLE))
        |      * (CAST(n1bw AS DOUBLE) / CAST(t_types AS DOUBLE)), 6)
        |    AS p_kn
        |FROM cb JOIN cpre USING (w1) JOIN cbw USING (w2) CROSS JOIN tt
        |ORDER BY cb DESC, w1, w2 LIMIT 50""".stripMargin,

    "q244_temperature_mix" ->
      """WITH bl AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang
        |), tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_tot FROM bl),
        |scored AS (
        |  SELECT lang, n_docs, n_tot,
        |    CAST(round(pow(CAST(n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE),
        |      0.3), 12) AS DECIMAL(38,12)) AS sd
        |  FROM bl CROSS JOIN tot
        |), norm AS (
        |  SELECT CAST(SUM(sd) AS DECIMAL(38,12)) AS s_tot FROM scored
        |)
        |SELECT lang, n_docs,
        |  round(CAST(n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE), 6) AS p_raw,
        |  round(CAST(sd AS DOUBLE) / CAST(s_tot AS DOUBLE), 6) AS weight,
        |  round(CAST(sd AS DOUBLE) / CAST(s_tot AS DOUBLE)
        |    * CAST(n_tot AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS upsample_factor
        |FROM scored CROSS JOIN norm
        |ORDER BY lang""".stripMargin,

    "q245_head_coverage" ->
      """WITH counts AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY tok
        |), tot AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS total_mass,
        |    CAST(COUNT(*) AS BIGINT) AS vocab_size
        |  FROM counts
        |), ranked AS (
        |  SELECT cnt,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
        |      AS rnk
        |  FROM counts QUALIFY rnk <= 1000
        |), ks AS (
        |  SELECT k, CAST(SUM(cnt) AS BIGINT) AS head_mass
        |  FROM ranked CROSS JOIN (SELECT unnest([10, 100, 1000]) AS k)
        |  WHERE rnk <= k GROUP BY k
        |)
        |SELECT CAST(k AS BIGINT) AS k, head_mass, total_mass, vocab_size,
        |  round(CAST(head_mass AS DOUBLE) / CAST(total_mass AS DOUBLE), 6)
        |    AS coverage
        |FROM ks CROSS JOIN tot
        |ORDER BY k""".stripMargin,

    "q246_clustering_coeff" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), kept AS MATERIALIZED (
        |  SELECT id_a, id_b FROM pj WHERE j >= 0.5
        |), tri AS (
        |  SELECT k1.id_a AS a, k1.id_b AS b, k2.id_b AS c
        |  FROM kept k1
        |  JOIN kept k2 ON k2.id_a = k1.id_b
        |  JOIN kept k3 ON k3.id_a = k1.id_a AND k3.id_b = k2.id_b
        |), tpv AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS tri_cnt
        |  FROM (SELECT unnest([a, b, c]) AS v FROM tri) GROUP BY v
        |), deg AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS degree
        |  FROM (SELECT id_a AS v FROM kept
        |        UNION ALL SELECT id_b FROM kept) GROUP BY v
        |)
        |SELECT deg.v AS doc_id, degree,
        |  COALESCE(tri_cnt, 0) AS tri_cnt,
        |  round(2.0 * CAST(COALESCE(tri_cnt, 0) AS DOUBLE)
        |    / (CAST(degree AS DOUBLE) * (CAST(degree AS DOUBLE) - 1.0)), 6)
        |    AS lcc
        |FROM deg LEFT JOIN tpv ON tpv.v = deg.v
        |WHERE degree >= 2
        |ORDER BY doc_id""".stripMargin,

    "q247_kcore_bounded" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), e0 AS MATERIALIZED (
        |  SELECT id_a, id_b FROM pj WHERE j >= 0.5
        |), k0 AS (
        |  SELECT v FROM (SELECT id_a AS v FROM e0
        |    UNION ALL SELECT id_b FROM e0) GROUP BY v HAVING COUNT(*) >= 2
        |), e1 AS (
        |  SELECT id_a, id_b FROM e0
        |  WHERE id_a IN (SELECT v FROM k0) AND id_b IN (SELECT v FROM k0)
        |), k1 AS (
        |  SELECT v FROM (SELECT id_a AS v FROM e1
        |    UNION ALL SELECT id_b FROM e1) GROUP BY v HAVING COUNT(*) >= 2
        |), e2 AS (
        |  SELECT id_a, id_b FROM e1
        |  WHERE id_a IN (SELECT v FROM k1) AND id_b IN (SELECT v FROM k1)
        |), k2 AS (
        |  SELECT v FROM (SELECT id_a AS v FROM e2
        |    UNION ALL SELECT id_b FROM e2) GROUP BY v HAVING COUNT(*) >= 2
        |), e3 AS (
        |  SELECT id_a, id_b FROM e2
        |  WHERE id_a IN (SELECT v FROM k2) AND id_b IN (SELECT v FROM k2)
        |), k3 AS (
        |  SELECT v FROM (SELECT id_a AS v FROM e3
        |    UNION ALL SELECT id_b FROM e3) GROUP BY v HAVING COUNT(*) >= 2
        |), e4 AS (
        |  SELECT id_a, id_b FROM e3
        |  WHERE id_a IN (SELECT v FROM k3) AND id_b IN (SELECT v FROM k3)
        |)
        |SELECT v AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
        |FROM (SELECT id_a AS v FROM e4 UNION ALL SELECT id_b FROM e4)
        |GROUP BY v ORDER BY doc_id""".stripMargin,

    "q248_two_hop" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), kept AS MATERIALIZED (
        |  SELECT id_a, id_b FROM pj WHERE j >= 0.5
        |), n1 AS MATERIALIZED (
        |  SELECT id_a AS v, id_b AS u FROM kept
        |  UNION ALL SELECT id_b, id_a FROM kept
        |), n2 AS (
        |  SELECT x.v, y.u FROM n1 x JOIN n1 y ON y.v = x.u
        |), reach AS (
        |  SELECT v, CAST(COUNT(DISTINCT u) AS BIGINT) AS reach2
        |  FROM (SELECT v, u FROM n1 UNION ALL SELECT v, u FROM n2)
        |  WHERE v <> u GROUP BY v
        |), deg AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS degree FROM n1 GROUP BY v
        |)
        |SELECT deg.v AS doc_id, degree, reach2
        |FROM deg JOIN reach ON reach.v = deg.v
        |ORDER BY doc_id""".stripMargin,

    "q249_mips" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) nrm FROM e
        |), mx AS (SELECT max(nrm) AS m FROM n),
        |q AS (SELECT * FROM n WHERE vec_id < 8),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) AS ip, q.nrm AS qn
        |  FROM q, n c WHERE c.vec_id <> q.vec_id
        |), rk AS (
        |  SELECT query_id, neighbor_id, ip, qn,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY ip DESC, neighbor_id) AS rnk
        |  FROM pairs
        |)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, ip,
        |  ip / (qn * m) AS aug_cos
        |FROM rk CROSS JOIN mx WHERE rnk <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q250_ewma_control" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1
        |), mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(rev) AS DECIMAL(38,2)) AS s1,
        |    CAST(SUM(CAST(CAST(rev AS DECIMAL(28,2)) * rev AS DECIMAL(38,4))) AS DECIMAL(38,4))
        |      AS s2
        |  FROM daily
        |), s0 AS (
        |  SELECT d, CAST(rev AS DOUBLE) AS x,
        |    CAST(row_number() OVER (ORDER BY d) AS DOUBLE) AS t
        |  FROM daily
        |), seq AS (
        |  SELECT d, x, t,
        |    first_value(x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
        |      AS x1,
        |    SUM(pow(1.25, t) * x) OVER (ORDER BY d
        |      ROWS UNBOUNDED PRECEDING) AS s_t
        |  FROM s0
        |), lim AS (
        |  SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    3.0 * sqrt((CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |          / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0)) * sqrt(0.2 / 1.8) AS half
        |  FROM mom
        |), ew AS (
        |  SELECT d, x,
        |    0.2 * pow(0.8, t) * (s_t - 1.25 * x1)
        |      + pow(0.8, t - 1.0) * x1 AS ewma
        |  FROM seq
        |)
        |SELECT d, x AS revenue, round(ewma, 2) AS ewma,
        |  round(mu + half, 2) AS ucl, round(mu - half, 2) AS lcl,
        |  (ewma > mu + half OR ewma < mu - half) AS out_of_control
        |FROM ew CROSS JOIN lim ORDER BY d""".stripMargin,

    "q251_pacf" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1
        |), di AS (
        |  SELECT rev, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS idx
        |  FROM daily
        |), mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(rev) AS DECIMAL(38,2)) AS s1,
        |    CAST(SUM(CAST(CAST(rev AS DECIMAL(28,2)) * rev AS DECIMAL(38,4))) AS DECIMAL(38,4))
        |      AS s2
        |  FROM di
        |), lagsums AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CAST(CAST(a.rev AS DECIMAL(28,2)) * b.rev AS DECIMAL(38,4)))
        |      AS DECIMAL(38,4)) AS sk,
        |    CAST(SUM(a.rev) AS DECIMAL(38,2)) AS hk,
        |    CAST(SUM(b.rev) AS DECIMAL(38,2)) AS tk
        |  FROM di a
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) ks
        |  JOIN di b ON b.idx = a.idx + k
        |  GROUP BY k
        |), md AS (
        |  SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
        |    CAST(s2 AS DOUBLE) AS s2d
        |  FROM mom
        |), md2 AS (
        |  SELECT mu, s2d - 2.0 * mu * s1d + nd * mu * mu AS den FROM md
        |), rs AS (
        |  SELECT
        |    max(CASE WHEN k = 1 THEN (CAST(sk AS DOUBLE)
        |      - mu * CAST(hk + tk AS DOUBLE)
        |      + CAST(n_pairs AS DOUBLE) * mu * mu) / den END) AS r1,
        |    max(CASE WHEN k = 2 THEN (CAST(sk AS DOUBLE)
        |      - mu * CAST(hk + tk AS DOUBLE)
        |      + CAST(n_pairs AS DOUBLE) * mu * mu) / den END) AS r2,
        |    max(CASE WHEN k = 3 THEN (CAST(sk AS DOUBLE)
        |      - mu * CAST(hk + tk AS DOUBLE)
        |      + CAST(n_pairs AS DOUBLE) * mu * mu) / den END) AS r3,
        |    max(CASE WHEN k = 1 THEN n_pairs END) AS np1,
        |    max(CASE WHEN k = 2 THEN n_pairs END) AS np2,
        |    max(CASE WHEN k = 3 THEN n_pairs END) AS np3
        |  FROM lagsums CROSS JOIN md2
        |), p2 AS (
        |  SELECT *, (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi22 FROM rs
        |), p3 AS (
        |  SELECT *, r1 - phi22 * r1 AS phi21 FROM p2
        |), fin AS (
        |  SELECT *, (r3 - phi21 * r2 - phi22 * r1)
        |    / (1.0 - phi21 * r1 - phi22 * r2) AS phi33 FROM p3
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS lag, np1 AS n_pairs,
        |    round(r1, 6) AS acf, round(r1, 6) AS pacf FROM fin
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), np2, round(r2, 6), round(phi22, 6)
        |  FROM fin
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), np3, round(r3, 6), round(phi33, 6)
        |  FROM fin
        |) ORDER BY lag""".stripMargin,

    "q252_rptree_ann" ->
      s"""WITH ${graft.similarity.RpTree.sqlAssignLeaves(3)},
        |fin AS (
        |  SELECT id, v, leaf, sqrt(list_dot_product(v, v)) AS nrm FROM l3
        |), q AS (
        |  SELECT id AS query_id, v AS qv, nrm AS qn, leaf AS qleaf
        |  FROM fin WHERE id < 50
        |), pairs AS (
        |  SELECT query_id, f.id AS neighbor_id,
        |    list_dot_product(qv, f.v) / (qn * f.nrm) AS cosine, f.leaf
        |  FROM q JOIN fin f ON f.leaf = qleaf AND f.id <> query_id
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM pairs
        |)
        |SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine,
        |  leaf
        |FROM rk WHERE rnk <= 3 ORDER BY query_id, rank""".stripMargin,

    "q253_query_likelihood" ->
      """WITH qt AS (
        |  SELECT query_id, unnest(string_split(query_text, ' ')) AS tok
        |  FROM (VALUES ('q1', 'spark table join'), ('q2', 'hash merge sort'),
        |    ('q3', 'fast row scan'), ('q4', 'window agg value'))
        |    AS v(query_id, query_text)
        |), ql AS (
        |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS qlen
        |  FROM qt GROUP BY 1
        |), toks AS MATERIALIZED (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2, 3
        |), ctf AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS ctf FROM toks GROUP BY 1
        |), ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS c_tot FROM toks),
        |part1 AS (
        |  SELECT query_id, doc_id,
        |    CAST(SUM(CAST(ln(1.0 + CAST(tf AS DOUBLE)
        |      / (2000.0 * (CAST(ctf AS DOUBLE) / CAST(c_tot AS DOUBLE))))
        |      AS DECIMAL(27,12))) AS DECIMAL(27,12)) AS s1,
        |    CAST(COUNT(*) AS BIGINT) AS n_matched
        |  FROM qt JOIN tf USING (tok) JOIN ctf USING (tok) CROSS JOIN ctot
        |  GROUP BY 1, 2
        |), dls AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents
        |), scored AS (
        |  SELECT query_id, doc_id, n_matched,
        |    CAST(s1 AS DOUBLE) + CAST(qlen AS DOUBLE)
        |      * ln(2000.0 / (CAST(dl AS DOUBLE) + 2000.0)) AS score
        |  FROM part1 JOIN dls USING (doc_id) JOIN ql USING (query_id)
        |), rk AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM scored
        |)
        |SELECT query_id, doc_id, rank, n_matched, round(score, 6) AS score
        |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q254_ndcg" ->
      """WITH qt AS (
        |  SELECT query_id, unnest(string_split(query_text, ' ')) AS tok
        |  FROM (VALUES ('q1', 'spark table join'), ('q2', 'hash merge sort'),
        |    ('q3', 'fast row scan'), ('q4', 'window agg value'))
        |    AS v(query_id, query_text)
        |), toks AS MATERIALIZED (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2, 3
        |), perdoc AS MATERIALIZED (
        |  SELECT query_id, doc_id, dl,
        |    CAST(COUNT(*) AS BIGINT) AS coverage,
        |    CAST(least(3, SUM(tf)) AS BIGINT) AS rel
        |  FROM qt JOIN tf USING (tok) GROUP BY 1, 2, 3
        |), sys AS (
        |  SELECT query_id, rel,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY coverage DESC, dl ASC, doc_id ASC) AS BIGINT) AS rank
        |  FROM perdoc QUALIFY rank <= 10
        |), dcg AS (
        |  SELECT query_id,
        |    CAST(SUM(CAST((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |      / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))
        |      AS DECIMAL(27,12))) AS DECIMAL(27,12)) AS dcg,
        |    CAST(COUNT(*) AS BIGINT) AS n_ranked
        |  FROM sys GROUP BY 1
        |), ideal AS (
        |  SELECT query_id, rel,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, doc_id ASC) AS BIGINT) AS rank
        |  FROM perdoc QUALIFY rank <= 10
        |), idcg AS (
        |  SELECT query_id,
        |    CAST(SUM(CAST((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |      / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))
        |      AS DECIMAL(27,12))) AS DECIMAL(27,12)) AS idcg
        |  FROM ideal GROUP BY 1
        |)
        |SELECT query_id, n_ranked,
        |  round(CAST(dcg AS DOUBLE), 6) AS dcg10,
        |  round(CAST(idcg AS DOUBLE), 6) AS idcg10,
        |  round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg10
        |FROM dcg JOIN idcg USING (query_id)
        |ORDER BY query_id""".stripMargin,

    "q255_phrase_search" ->
      """WITH ph AS (
        |  SELECT phrase, string_split(phrase, ' ')[1] AS t1,
        |    string_split(phrase, ' ')[2] AS t2
        |  FROM (VALUES ('hash join'), ('merge sort'), ('table scan'))
        |    AS v(phrase)
        |), pos AS MATERIALIZED (
        |  SELECT doc_id, tk[i] AS tok, i AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
        |        FROM documents),
        |    LATERAL unnest(range(1, len(tk) + 1)) AS u(i)
        |), m1 AS (
        |  SELECT phrase, doc_id, pos FROM ph JOIN pos ON tok = t1
        |), m2 AS (
        |  SELECT phrase, doc_id, pos - 1 AS pos FROM ph JOIN pos ON tok = t2
        |), occ AS (
        |  SELECT phrase, doc_id, CAST(COUNT(*) AS BIGINT) AS occ
        |  FROM m1 JOIN m2 USING (phrase, doc_id, pos)
        |  GROUP BY 1, 2
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY phrase
        |    ORDER BY occ DESC, doc_id) AS rn
        |  FROM occ
        |)
        |SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(occ) AS BIGINT) AS n_occ,
        |  CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
        |    AS top_doc_id,
        |  CAST(MAX(CASE WHEN rn = 1 THEN occ END) AS BIGINT)
        |    AS top_doc_occ
        |FROM rk GROUP BY phrase ORDER BY phrase""".stripMargin,

    "q256_jonckheere" ->
      """WITH src AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(floor(o_totalprice / 100.0) AS BIGINT) AS v
        |  FROM orders
        |), gv AS (
        |  SELECT g, v, CAST(COUNT(*) AS BIGINT) AS n FROM src GROUP BY 1, 2
        |), grid AS (
        |  SELECT gs.g, vals.v, COALESCE(gv.n, 0) AS n
        |  FROM (SELECT DISTINCT v FROM gv) vals
        |  CROSS JOIN (SELECT DISTINCT g FROM gv) gs
        |  LEFT JOIN gv ON gv.g = gs.g AND gv.v = vals.v
        |), cum AS (
        |  SELECT g, v, n,
        |    CAST(SUM(n) OVER (PARTITION BY g ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) - n AS cumlt
        |  FROM grid
        |), twoj AS (
        |  SELECT CAST(SUM(j.n * (2 * i.cumlt + i.n)) AS BIGINT) AS two_j
        |  FROM cum i JOIN gv j ON j.v = i.v AND i.g < j.g
        |), sizes AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g FROM src GROUP BY 1
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n_tot,
        |    CAST(SUM(n_g * n_g) AS BIGINT) AS sum_n2,
        |    CAST(SUM(n_g * n_g * (2 * n_g + 3)) AS BIGINT) AS sum_n23
        |  FROM sizes
        |)
        |SELECT k, n_tot, two_j,
        |  round((CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
        |    - CAST(sum_n2 AS DOUBLE)) / 4.0, 6) AS e_j,
        |  round((CAST(two_j AS DOUBLE) / 2.0
        |      - (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
        |        - CAST(sum_n2 AS DOUBLE)) / 4.0)
        |    / sqrt((CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)
        |        * (2.0 * CAST(n_tot AS DOUBLE) + 3.0)
        |        - CAST(sum_n23 AS DOUBLE)) / 72.0), 6) AS z_score
        |FROM twoj CROSS JOIN tot""".stripMargin,

    "q257_snapshot_diff" ->
      """WITH h AS (
        |  SELECT user_id, event_id,
        |    epoch_us(ts) AS valid_from_us,
        |    COALESCE(epoch_us(lead(ts) OVER w), 253402214400000000)
        |      AS valid_to_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s1 AS (
        |  SELECT user_id, event_id AS old_event FROM h
        |  WHERE valid_from_us <= 1704844800000000
        |    AND valid_to_us > 1704844800000000
        |), s2 AS (
        |  SELECT user_id, event_id AS new_event FROM h
        |  WHERE valid_from_us <= 1705708800000000
        |    AND valid_to_us > 1705708800000000
        |), d AS (
        |  SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
        |    CASE WHEN s1.user_id IS NULL THEN 'ADDED'
        |         WHEN s2.user_id IS NULL THEN 'REMOVED'
        |         WHEN old_event <> new_event THEN 'CHANGED'
        |         ELSE 'UNCHANGED' END AS change_type,
        |    old_event, new_event
        |  FROM s1 FULL OUTER JOIN s2 ON s2.user_id = s1.user_id
        |)
        |SELECT * FROM d WHERE change_type <> 'UNCHANGED'
        |ORDER BY user_id""".stripMargin,

    "q258_sorted_neighborhood" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    substring(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^\p{L}\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')), 1, 24) AS sk
        |  FROM documents
        |), rk AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY sk, doc_id) AS BIGINT) AS rnk
        |  FROM keyed
        |), cand AS (
        |  SELECT least(a.doc_id, b.doc_id) AS id_a,
        |    greatest(a.doc_id, b.doc_id) AS id_b,
        |    b.rnk - a.rnk AS rank_dist
        |  FROM rk a JOIN rk b ON b.rnk - a.rnk BETWEEN 1 AND 3
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |      ELSE [] END) AS sg
        |  FROM (SELECT doc_id, string_split(text, ' ') tk FROM documents)
        |), pj AS (
        |  SELECT id_a, id_b, rank_dist,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE)
        |      AS jaccard
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a
        |  JOIN sh sb ON sb.doc_id = id_b
        |)
        |SELECT id_a, id_b, rank_dist, jaccard FROM pj
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "q259_rolling_range" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS daynum
        |  FROM orders GROUP BY 1, 3
        |)
        |SELECT d, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(CAST(SUM(rev) OVER (ORDER BY daynum
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |    AS DECIMAL(38,2)) AS DOUBLE) AS rev_7d,
        |  CAST(COUNT(*) OVER (ORDER BY daynum
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS days_present
        |FROM daily ORDER BY d""".stripMargin,

    "q260_equidepth_histogram" ->
      """WITH grain AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1
        |), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM grain),
        |cum AS (
        |  SELECT v, n, CAST(SUM(n) OVER (ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM grain
        |)
        |SELECT CAST(floor(CAST((cum - 1) * 8 AS DOUBLE)
        |    / CAST(n_tot AS DOUBLE)) + 1 AS BIGINT) AS bucket,
        |  CAST(MIN(v) AS DOUBLE) AS lo, CAST(MAX(v) AS DOUBLE) AS hi,
        |  CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct
        |FROM cum CROSS JOIN tot
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q261_mutual_knn" ->
      """WITH e AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) v
        |  FROM embeddings
        |), n AS (
        |  SELECT id, v, sqrt(list_dot_product(v, v)) nrm FROM e
        |), knn AS (
        |  SELECT a.id AS src, b.id AS dst,
        |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos,
        |    CAST(row_number() OVER (PARTITION BY a.id
        |      ORDER BY list_dot_product(a.v, b.v) / (a.nrm * b.nrm) DESC,
        |        b.id ASC) AS BIGINT) AS rank
        |  FROM n a JOIN n b ON b.id <> a.id
        |  QUALIFY rank <= 5
        |), fwd AS (
        |  SELECT src AS id_a, dst AS id_b, cos, rank AS rank_ab
        |  FROM knn WHERE src < dst
        |), bwd AS (
        |  SELECT dst AS id_a, src AS id_b, rank AS rank_ba
        |  FROM knn WHERE src > dst
        |)
        |SELECT id_a, id_b, cos, rank_ab, rank_ba
        |FROM fwd JOIN bwd USING (id_a, id_b)
        |ORDER BY id_a, id_b""".stripMargin,

    "q262_pr_curve" ->
      """WITH ev AS (
        |  SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events
        |), grain AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS n_v,
        |    CAST(SUM(pos) AS BIGINT) AS p_v
        |  FROM ev GROUP BY v
        |), cum AS (
        |  SELECT v, n_v, p_v,
        |    CAST(SUM(n_v) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cumn,
        |    CAST(SUM(p_v) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cump
        |  FROM grain
        |), tot AS (
        |  SELECT CAST(SUM(p_v) AS BIGINT) AS n_pos,
        |    CAST(SUM(n_v) - SUM(p_v) AS BIGINT) AS n_neg
        |  FROM grain
        |)
        |SELECT max(n_pos) AS n_pos, max(n_neg) AS n_neg,
        |  round(CAST(SUM(CAST(CAST(p_v AS DOUBLE)
        |      * (CAST(cump AS DOUBLE) / CAST(cumn AS DOUBLE))
        |      AS DECIMAL(27,12))) AS DOUBLE)
        |    / CAST(max(n_pos) AS DOUBLE), 6) AS avg_precision,
        |  round(max(CASE WHEN CAST(cump AS DOUBLE) / CAST(n_pos AS DOUBLE)
        |      >= 0.25 THEN CAST(cump AS DOUBLE) / CAST(cumn AS DOUBLE)
        |    END), 6) AS p_at_r25,
        |  round(max(CASE WHEN CAST(cump AS DOUBLE) / CAST(n_pos AS DOUBLE)
        |      >= 0.5 THEN CAST(cump AS DOUBLE) / CAST(cumn AS DOUBLE)
        |    END), 6) AS p_at_r50,
        |  round(max(CASE WHEN CAST(cump AS DOUBLE) / CAST(n_pos AS DOUBLE)
        |      >= 0.75 THEN CAST(cump AS DOUBLE) / CAST(cumn AS DOUBLE)
        |    END), 6) AS p_at_r75
        |FROM cum CROSS JOIN tot""".stripMargin,

    "q263_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS daynum
        |  FROM orders GROUP BY 1, 3
        |), dowd AS (
        |  SELECT *, daynum % 7 AS dow FROM daily
        |), trended AS (
        |  SELECT d, rev, dow,
        |    CAST(COUNT(*) OVER win AS BIGINT) AS win_n,
        |    CAST(SUM(rev) OVER win AS DECIMAL(38,2)) AS win_sum
        |  FROM dowd
        |  WINDOW win AS (ORDER BY daynum
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |  QUALIFY win_n = 7
        |), rat AS (
        |  SELECT d, rev, dow,
        |    CAST(win_sum AS DOUBLE) / 7.0 AS trend,
        |    CAST(rev AS DOUBLE) / (CAST(win_sum AS DOUBLE) / 7.0) AS ratio
        |  FROM trended
        |), sidx AS (
        |  SELECT dow,
        |    CAST(SUM(CAST(ratio AS DECIMAL(27,12))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS s_raw
        |  FROM rat GROUP BY 1
        |), smean AS (
        |  SELECT CAST(SUM(CAST(round(s_raw, 12) AS DECIMAL(27,12)))
        |    AS DOUBLE) / 7.0 AS s_mean
        |  FROM sidx
        |), sfin AS (
        |  SELECT dow, s_raw / s_mean AS seasonal
        |  FROM sidx CROSS JOIN smean
        |)
        |SELECT d, CAST(rev AS DOUBLE) AS revenue,
        |  round(trend, 6) AS trend, dow,
        |  round(seasonal, 6) AS seasonal,
        |  round(ratio / seasonal, 6) AS remainder
        |FROM rat JOIN sfin USING (dow)
        |ORDER BY d""".stripMargin,

    "q264_sax" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS daynum
        |  FROM orders GROUP BY 1, 3
        |), mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(rev) AS DECIMAL(38,2)) AS s1,
        |    CAST(SUM(CAST(CAST(rev AS DECIMAL(28,2)) * rev
        |      AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2
        |  FROM daily
        |), d0 AS (SELECT MIN(daynum) AS day0 FROM daily),
        |segs AS (
        |  SELECT CAST(floor(CAST(daynum - day0 AS DOUBLE) / 30.0)
        |      AS BIGINT) AS seg,
        |    CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(rev) AS DECIMAL(38,2)) AS seg_sum
        |  FROM daily CROSS JOIN d0 GROUP BY 1
        |), paa AS (
        |  SELECT seg, n_days,
        |    CAST(seg_sum AS DOUBLE) / CAST(n_days AS DOUBLE) AS paa
        |  FROM segs
        |), zed AS (
        |  SELECT seg, n_days, paa,
        |    (paa - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt((CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |          / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0)) AS z
        |  FROM paa CROSS JOIN mom
        |), symd AS (
        |  SELECT seg, n_days, round(paa, 2) AS paa, round(z, 6) AS z,
        |    CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
        |         WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS symbol
        |  FROM zed
        |)
        |SELECT s0.seg, s0.n_days, s0.paa, s0.z, s0.symbol,
        |  CASE WHEN s1.symbol IS NOT NULL AND s2.symbol IS NOT NULL
        |    THEN s0.symbol || s1.symbol || s2.symbol END AS motif3
        |FROM symd s0
        |LEFT JOIN symd s1 ON s1.seg = s0.seg + 1
        |LEFT JOIN symd s2 ON s2.seg = s0.seg + 2
        |ORDER BY s0.seg""".stripMargin,

    "q265_did" ->
      """WITH ev AS (
        |  SELECT CAST((CAST(md5_number_upper(CAST(user_id AS VARCHAR))
        |      AS HUGEINT) % 2305843009213693951) % 2 AS BIGINT) AS arm,
        |    (epoch_us(ts) >= 1705276800000000) AS post,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'
        |), cells AS (
        |  SELECT arm, post, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS DECIMAL(38,2)) AS s
        |  FROM ev GROUP BY 1, 2
        |), one AS (
        |  SELECT
        |    max(CASE WHEN arm = 1 AND NOT post THEN n END) AS n_t_pre,
        |    max(CASE WHEN arm = 1 AND post THEN n END) AS n_t_post,
        |    max(CASE WHEN arm = 0 AND NOT post THEN n END) AS n_c_pre,
        |    max(CASE WHEN arm = 0 AND post THEN n END) AS n_c_post,
        |    max(CASE WHEN arm = 1 AND NOT post THEN s END) AS s_t_pre,
        |    max(CASE WHEN arm = 1 AND post THEN s END) AS s_t_post,
        |    max(CASE WHEN arm = 0 AND NOT post THEN s END) AS s_c_pre,
        |    max(CASE WHEN arm = 0 AND post THEN s END) AS s_c_post
        |  FROM cells
        |)
        |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  round(CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE), 6)
        |    AS mean_t_pre,
        |  round(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE), 6)
        |    AS mean_t_post,
        |  round(CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE), 6)
        |    AS mean_c_pre,
        |  round(CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE), 6)
        |    AS mean_c_post,
        |  round((CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
        |      - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
        |    - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
        |      - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)), 6)
        |    AS did_estimate
        |FROM one""".stripMargin,

    "q266_changepoint" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1
        |), seq AS (
        |  SELECT d, rev,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        |  FROM daily
        |), pre AS (
        |  SELECT d, t,
        |    CAST(SUM(rev) OVER w AS DECIMAL(38,2)) AS cs,
        |    CAST(SUM(CAST(CAST(rev AS DECIMAL(28,2)) * rev
        |      AS DECIMAL(38,4))) OVER w AS DECIMAL(38,4)) AS cs2
        |  FROM seq
        |  WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |), tot AS (
        |  SELECT max(t) AS n, max(cs) AS s_tot, max(cs2) AS s2_tot
        |  FROM pre
        |), sc AS (
        |  SELECT d, t, n,
        |    round(CAST(cs AS DOUBLE) / CAST(t AS DOUBLE), 6) AS mean_left,
        |    round(CAST(s_tot - cs AS DOUBLE) / CAST(n - t AS DOUBLE), 6)
        |      AS mean_right,
        |    (CAST(s2_tot AS DOUBLE) - CAST(s_tot AS DOUBLE)
        |        * CAST(s_tot AS DOUBLE) / CAST(n AS DOUBLE))
        |      - ((CAST(cs2 AS DOUBLE) - CAST(cs AS DOUBLE)
        |          * CAST(cs AS DOUBLE) / CAST(t AS DOUBLE))
        |        + (CAST(s2_tot - cs2 AS DOUBLE)
        |          - CAST(s_tot - cs AS DOUBLE) * CAST(s_tot - cs AS DOUBLE)
        |            / CAST(n - t AS DOUBLE))) AS gain_raw
        |  FROM pre CROSS JOIN tot
        |  WHERE t >= 7 AND t <= n - 7
        |), rk AS (
        |  SELECT *, row_number() OVER (ORDER BY gain_raw DESC, t) AS rn
        |  FROM sc
        |)
        |SELECT d AS split_day, t AS t_index, t AS n_left,
        |  n - t AS n_right, mean_left, mean_right,
        |  round(gain_raw / 1000000.0, 3) AS ss_gain_millions
        |FROM rk WHERE rn = 1""".stripMargin,

    "q267_cuped" ->
      """WITH base AS (
        |  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
        |    (epoch_us(ts) >= 1705276800000000) AS post
        |  FROM events WHERE event_type = 'purchase'
        |), pu AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN NOT post THEN v
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS x,
        |    CAST(SUM(CASE WHEN post THEN v
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS y
        |  FROM base GROUP BY 1
        |), pua AS (
        |  SELECT CAST((CAST(md5_number_upper(CAST(user_id AS VARCHAR))
        |      AS HUGEINT) % 2305843009213693951) % 2 AS BIGINT) AS arm,
        |    x, y
        |  FROM pu
        |), mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
        |    CAST(SUM(y) AS DECIMAL(38,2)) AS sy,
        |    CAST(SUM(CAST(CAST(x AS DECIMAL(28,2)) * x AS DECIMAL(38,4)))
        |      AS DECIMAL(38,4)) AS sxx,
        |    CAST(SUM(CAST(CAST(y AS DECIMAL(28,2)) * y AS DECIMAL(38,4)))
        |      AS DECIMAL(38,4)) AS syy,
        |    CAST(SUM(CAST(CAST(x AS DECIMAL(28,2)) * y AS DECIMAL(38,4)))
        |      AS DECIMAL(38,4)) AS sxy
        |  FROM pua
        |), arms AS (
        |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_a,
        |    CAST(SUM(x) AS DECIMAL(38,2)) AS sx_a,
        |    CAST(SUM(y) AS DECIMAL(38,2)) AS sy_a
        |  FROM pua GROUP BY 1
        |), armrow AS (
        |  SELECT max(CASE WHEN arm = 1 THEN n_a END) AS n_t,
        |    max(CASE WHEN arm = 0 THEN n_a END) AS n_c,
        |    max(CASE WHEN arm = 1 THEN sx_a END) AS sx_t,
        |    max(CASE WHEN arm = 0 THEN sx_a END) AS sx_c,
        |    max(CASE WHEN arm = 1 THEN sy_a END) AS sy_t,
        |    max(CASE WHEN arm = 0 THEN sy_a END) AS sy_c
        |  FROM arms
        |), md AS (
        |  SELECT n, n_t, n_c,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS varx,
        |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vary,
        |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS covxy,
        |    CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS amx_t,
        |    CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS amx_c,
        |    CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS amy_t,
        |    CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS amy_c
        |  FROM mom CROSS JOIN armrow
        |)
        |SELECT n AS n_users, n_t, n_c,
        |  round(covxy / varx, 6) AS theta,
        |  round(vary, 6) AS var_raw,
        |  round(vary - covxy * covxy / varx, 6) AS var_cuped,
        |  round((1.0 - (vary - covxy * covxy / varx) / vary) * 100.0, 6)
        |    AS reduction_pct,
        |  round(amy_t - amy_c, 6) AS diff_raw,
        |  round((amy_t - covxy / varx * (amx_t - mx))
        |    - (amy_c - covxy / varx * (amx_c - mx)), 6) AS diff_cuped
        |FROM md""".stripMargin,

    "q268_modularity" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |pj AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |      / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) AS j
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |), kept AS MATERIALIZED (
        |  SELECT id_a, id_b FROM pj WHERE j >= 0.5
        |), tagged AS MATERIALIZED (
        |  SELECT id_a, id_b, da.lang AS la, db.lang AS lb
        |  FROM kept JOIN documents da ON da.doc_id = id_a
        |  JOIN documents db ON db.doc_id = id_b
        |), m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM tagged),
        |intra AS (
        |  SELECT la AS lang, CAST(COUNT(*) AS BIGINT) AS e_c
        |  FROM tagged WHERE la = lb GROUP BY 1
        |), deg AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_c
        |  FROM (SELECT id_a AS v, la AS lang FROM tagged
        |        UNION ALL SELECT id_b, lb FROM tagged)
        |  GROUP BY 1
        |), terms AS (
        |  SELECT deg.lang, COALESCE(e_c, 0) AS e_c, d_c,
        |    CAST(round(CAST(COALESCE(e_c, 0) AS DOUBLE) / CAST(m AS DOUBLE)
        |      - (CAST(d_c AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
        |        * (CAST(d_c AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))), 12)
        |      AS DECIMAL(27,12)) AS term,
        |    m
        |  FROM deg LEFT JOIN intra ON intra.lang = deg.lang CROSS JOIN m
        |), q AS (
        |  SELECT round(CAST(SUM(term) AS DOUBLE), 6) AS modularity_q
        |  FROM terms
        |)
        |SELECT lang, e_c, d_c,
        |  round(CAST(term AS DOUBLE), 6) AS q_term, modularity_q,
        |  m AS n_edges
        |FROM terms CROSS JOIN q
        |ORDER BY lang""".stripMargin,

    "q269_skyline" ->
      """WITH parts AS (
        |  SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM part
        |), flagged AS (
        |  SELECT p_partkey, size, cents,
        |    max(size) OVER (ORDER BY cents
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS best_lt,
        |    max(size) OVER (PARTITION BY cents) AS best_eq
        |  FROM parts
        |)
        |SELECT p_partkey, CAST(cents AS DOUBLE) / 100.0 AS retail_price,
        |  size
        |FROM flagged
        |WHERE (best_lt IS NULL OR best_lt < size) AND best_eq = size
        |ORDER BY retail_price, p_partkey""".stripMargin,

    "q270_ks_two_sample" ->
      """WITH ev AS (
        |  SELECT CAST((CAST(md5_number_upper(CAST(user_id AS VARCHAR))
        |      AS HUGEINT) % 2305843009213693951) % 2 AS BIGINT) AS arm,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events
        |), grain AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0v,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1v
        |  FROM ev GROUP BY v
        |), cum AS (
        |  SELECT v, n0v, n1v,
        |    CAST(SUM(n0v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS c0,
        |    CAST(SUM(n1v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS c1
        |  FROM grain
        |), tot AS (
        |  SELECT CAST(SUM(n0v) AS BIGINT) AS n0,
        |    CAST(SUM(n1v) AS BIGINT) AS n1
        |  FROM grain
        |), rk AS (
        |  SELECT v, n0, n1, abs(c0 * n1 - c1 * n0) AS gap_num,
        |    row_number() OVER (ORDER BY abs(c0 * n1 - c1 * n0) DESC, v)
        |      AS rn
        |  FROM cum CROSS JOIN tot
        |)
        |SELECT n0, n1, CAST(gap_num AS BIGINT) AS gap_num,
        |  CAST(v AS DOUBLE) AS at_value,
        |  round(CAST(gap_num AS DOUBLE)
        |    / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)), 6) AS d_stat,
        |  round(CAST(gap_num AS DOUBLE)
        |    / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
        |    * sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
        |      / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))), 6) AS ks_z
        |FROM rk WHERE rn = 1""".stripMargin,

    "q271_periodogram" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1
        |), seq AS (
        |  SELECT rev,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        |  FROM daily
        |), mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(rev) AS DECIMAL(38,2)) AS s1,
        |    CAST(SUM(CAST(CAST(rev AS DECIMAL(28,2)) * rev
        |      AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2
        |  FROM seq
        |), withp AS (
        |  SELECT rev, t, period,
        |    6.283185307179586 * CAST(t AS DOUBLE)
        |      / CAST(period AS DOUBLE) AS theta
        |  FROM seq CROSS JOIN (SELECT unnest([7, 30, 90]) AS period)
        |), sums AS (
        |  SELECT CAST(period AS BIGINT) AS period,
        |    CAST(SUM(CAST(CAST(round(cos(theta), 12) AS DECIMAL(24,12))
        |      * rev AS DECIMAL(38,14))) AS DECIMAL(38,14)) AS a,
        |    CAST(SUM(CAST(CAST(round(sin(theta), 12) AS DECIMAL(24,12))
        |      * rev AS DECIMAL(38,14))) AS DECIMAL(38,14)) AS b
        |  FROM withp GROUP BY 1
        |)
        |SELECT period,
        |  round(CAST(a AS DOUBLE) / 1000000.0, 3) AS a_millions,
        |  round(CAST(b AS DOUBLE) / 1000000.0, 3) AS b_millions,
        |  round((CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
        |      + CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) * 2.0
        |    / (CAST(n AS DOUBLE) * (CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        / CAST(n AS DOUBLE))), 6) AS var_fraction
        |FROM sums CROSS JOIN mom
        |ORDER BY period""".stripMargin,

    "q272_welch_anova" ->
      """WITH gs AS (
        |  SELECT event_type AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |      AS s1,
        |    CAST(SUM(CAST(CAST(CAST(value AS DECIMAL(18,2))
        |      AS DECIMAL(28,2)) * CAST(value AS DECIMAL(18,2))
        |      AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2
        |  FROM events GROUP BY 1
        |), gd AS (
        |  SELECT g, n_g,
        |    CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean_g,
        |    CAST(n_g AS DOUBLE) / ((CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        / CAST(n_g AS DOUBLE))
        |      / (CAST(n_g AS DOUBLE) - 1.0)) AS wg
        |  FROM gs
        |), base AS (
        |  SELECT g, n_g,
        |    CAST(round(wg, 12) AS DECIMAL(27,12)) AS w,
        |    CAST(round(wg * mean_g, 6) AS DECIMAL(38,6)) AS wm,
        |    wg, mean_g
        |  FROM gd
        |), tots AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(w) AS DECIMAL(38,12)) AS w_tot,
        |    CAST(SUM(wm) AS DECIMAL(38,6)) AS wm_tot
        |  FROM base
        |), terms AS (
        |  SELECT k, n_g,
        |    CAST(round(wg * (mean_g - CAST(wm_tot AS DOUBLE)
        |        / CAST(w_tot AS DOUBLE))
        |      * (mean_g - CAST(wm_tot AS DOUBLE)
        |        / CAST(w_tot AS DOUBLE)), 6) AS DECIMAL(38,6)) AS a_t,
        |    CAST(round((1.0 - wg / CAST(w_tot AS DOUBLE))
        |      * (1.0 - wg / CAST(w_tot AS DOUBLE))
        |      / (CAST(n_g AS DOUBLE) - 1.0), 12) AS DECIMAL(27,12)) AS b_t
        |  FROM base CROSS JOIN tots
        |), red AS (
        |  SELECT max(k) AS k, CAST(SUM(n_g) AS BIGINT) AS n_tot,
        |    CAST(SUM(a_t) AS DOUBLE) AS a_sum,
        |    CAST(SUM(b_t) AS DOUBLE) AS b_sum
        |  FROM terms
        |)
        |SELECT k, n_tot,
        |  round((a_sum / (CAST(k AS DOUBLE) - 1.0))
        |    / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
        |      / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * b_sum), 6)
        |    AS f_welch,
        |  k - 1 AS df1,
        |  round((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
        |    / (3.0 * b_sum), 6) AS df2
        |FROM red""".stripMargin,

    "q273_permutation_entropy" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1
        |), seq AS (
        |  SELECT rev,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        |  FROM daily
        |), tri AS (
        |  SELECT a.rev AS x1, b.rev AS x2, c.rev AS x3
        |  FROM seq a JOIN seq b ON b.t = a.t + 1
        |  JOIN seq c ON c.t = a.t + 2
        |), pats AS (
        |  SELECT (1 + (CASE WHEN x2 < x1 THEN 1 ELSE 0 END)
        |        + (CASE WHEN x3 < x1 THEN 1 ELSE 0 END)) * 100
        |    + (1 + (CASE WHEN x1 < x2 OR x1 = x2 THEN 1 ELSE 0 END)
        |        + (CASE WHEN x3 < x2 THEN 1 ELSE 0 END)) * 10
        |    + (1 + (CASE WHEN x1 < x3 OR x1 = x3 THEN 1 ELSE 0 END)
        |        + (CASE WHEN x2 < x3 OR x2 = x3 THEN 1 ELSE 0 END))
        |    AS pattern
        |  FROM tri
        |), cnts AS (
        |  SELECT CAST(pattern AS BIGINT) AS pattern,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM pats GROUP BY 1
        |), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tri FROM cnts),
        |terms AS (
        |  SELECT pattern, cnt, n_tri,
        |    round(CAST(cnt AS DOUBLE) / CAST(n_tri AS DOUBLE), 6)
        |      AS p_hat,
        |    CAST(round(-(CAST(cnt AS DOUBLE) / CAST(n_tri AS DOUBLE))
        |      * ln(CAST(cnt AS DOUBLE) / CAST(n_tri AS DOUBLE)), 12)
        |      AS DECIMAL(27,12)) AS term
        |  FROM cnts CROSS JOIN tot
        |), h AS (
        |  SELECT round(CAST(SUM(term) AS DOUBLE) / ln(6.0), 6)
        |    AS perm_entropy
        |  FROM terms
        |)
        |SELECT pattern, cnt, p_hat, perm_entropy, n_tri
        |FROM terms CROSS JOIN h
        |ORDER BY pattern""".stripMargin,

    "q274_eb_shrinkage" ->
      """WITH src AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pass
        |  FROM documents GROUP BY 1
        |), scored AS (
        |  SELECT source, n, pass,
        |    CAST(round(CAST(pass AS DOUBLE) / CAST(n AS DOUBLE), 12)
        |      AS DECIMAL(27,12)) AS rd,
        |    CAST(round((CAST(pass AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(pass AS DOUBLE) / CAST(n AS DOUBLE)), 12)
        |      AS DECIMAL(27,12)) AS rd2
        |  FROM src
        |), pri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(rd) AS DECIMAL(38,12)) AS sr,
        |    CAST(SUM(rd2) AS DECIMAL(38,12)) AS sr2
        |  FROM scored
        |), md AS (
        |  SELECT k, CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) AS m,
        |    (CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)
        |      / CAST(k AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) AS v
        |  FROM pri
        |), cp AS (
        |  SELECT m, m * (1.0 - m) / v - 1.0 AS c FROM md
        |)
        |SELECT source, n, pass,
        |  round(CAST(pass AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
        |  round((CAST(pass AS DOUBLE) + m * c)
        |    / (CAST(n AS DOUBLE) + c), 6) AS shrunk_rate,
        |  round(CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) + c), 6)
        |    AS shrink_weight,
        |  round(m, 6) AS prior_mean
        |FROM scored CROSS JOIN cp
        |ORDER BY source""".stripMargin,

    "q275_gini_screening" ->
      """WITH ev AS (
        |  SELECT ts, value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events
        |), melted AS (
        |  SELECT 'hour6' AS feature,
        |    CAST(floor(CAST(hour(ts) AS DOUBLE) / 6.0) AS BIGINT)
        |      AS bucket, pos
        |  FROM ev
        |  UNION ALL
        |  SELECT 'value_band',
        |    CASE WHEN value < 10 THEN 0 WHEN value < 50 THEN 1
        |         WHEN value < 150 THEN 2 ELSE 3 END, pos
        |  FROM ev
        |  UNION ALL
        |  SELECT 'weekday',
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 86400000000.0)
        |      AS BIGINT) % 7, pos
        |  FROM ev
        |), cell AS (
        |  SELECT feature, bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
        |    CAST(SUM(pos) AS BIGINT) AS p_b
        |  FROM melted GROUP BY 1, 2
        |), tot AS (
        |  SELECT feature, CAST(SUM(n_b) AS BIGINT) AS n_tot,
        |    CAST(SUM(p_b) AS BIGINT) AS p_tot
        |  FROM cell GROUP BY 1
        |), j AS (
        |  SELECT cell.feature, n_b, p_b, n_tot, p_tot,
        |    CAST(round(CAST(n_b AS DOUBLE) / CAST(n_tot AS DOUBLE)
        |      * (1.0 - (CAST(p_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |          * (CAST(p_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |        - (1.0 - CAST(p_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |          * (1.0 - CAST(p_b AS DOUBLE) / CAST(n_b AS DOUBLE))),
        |      12) AS DECIMAL(27,12)) AS w_term,
        |    1.0 - (CAST(p_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |        * (CAST(p_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |      - (1.0 - CAST(p_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |        * (1.0 - CAST(p_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |      AS parent_g
        |  FROM cell JOIN tot ON tot.feature = cell.feature
        |)
        |SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  round(max(parent_g), 6) AS gini_parent,
        |  round(CAST(SUM(w_term) AS DOUBLE), 6) AS gini_split,
        |  round(max(parent_g) - CAST(SUM(w_term) AS DOUBLE), 6)
        |    AS gini_gain
        |FROM j GROUP BY feature ORDER BY feature""".stripMargin,

    "q276_tornado" ->
      """WITH li AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS ep,
        |    CAST(l_discount AS DECIMAL(18,2)) AS disc,
        |    CAST(l_tax AS DECIMAL(18,2)) AS tax
        |  FROM lineitem
        |), scen AS (
        |  SELECT scenario, CAST(mp AS DECIMAL(2,1)) AS mp,
        |    CAST(md AS DECIMAL(2,1)) AS md, CAST(mt AS DECIMAL(2,1)) AS mt
        |  FROM (VALUES ('base', '1.0', '1.0', '1.0'),
        |    ('price_down', '0.9', '1.0', '1.0'),
        |    ('price_up', '1.1', '1.0', '1.0'),
        |    ('discount_down', '1.0', '0.9', '1.0'),
        |    ('discount_up', '1.0', '1.1', '1.0'),
        |    ('tax_down', '1.0', '1.0', '0.9'),
        |    ('tax_up', '1.0', '1.0', '1.1'))
        |    AS v(scenario, mp, md, mt)
        |), totals AS (
        |  SELECT scenario,
        |    CAST(SUM(CAST(
        |      CAST(CAST(ep * mp AS DECIMAL(24,3))
        |        * CAST(CAST(1 AS DECIMAL(4,3))
        |          - CAST(disc * md AS DECIMAL(6,3)) AS DECIMAL(6,3))
        |        AS DECIMAL(28,6))
        |      * CAST(CAST(1 AS DECIMAL(4,3))
        |        + CAST(tax * mt AS DECIMAL(6,3)) AS DECIMAL(6,3))
        |      AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS tot
        |  FROM li CROSS JOIN scen GROUP BY 1
        |), bt AS (
        |  SELECT tot AS base_tot FROM totals WHERE scenario = 'base'
        |)
        |SELECT scenario,
        |  round(CAST(tot AS DOUBLE) / 1000000.0, 3) AS revenue_millions,
        |  round((CAST(tot AS DOUBLE) - CAST(base_tot AS DOUBLE))
        |    / CAST(base_tot AS DOUBLE) * 100.0, 6) AS delta_pct
        |FROM totals CROSS JOIN bt
        |ORDER BY scenario""".stripMargin,

    "q277_merkle_diff" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CAST(floor(CAST(epoch_us(o_orderdate) AS DOUBLE)
        |      / 86400000000.0) AS BIGINT) AS eday,
        |    o_orderkey % 256 AS bucket
        |  FROM orders
        |), h AS (
        |  SELECT bucket, o_orderkey,
        |    CAST(CAST(md5_number_upper(concat_ws('|', o_orderkey,
        |      o_custkey, cents, eday)) AS HUGEINT)
        |      % 2305843009213693951 AS BIGINT) AS rh
        |  FROM r
        |), f AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_full,
        |    CAST(SUM(CAST(rh AS HUGEINT)) % 2305843009213693951
        |      AS BIGINT) AS dig_full
        |  FROM h GROUP BY 1
        |), rep AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_replica,
        |    CAST(SUM(CAST(rh AS HUGEINT)) % 2305843009213693951
        |      AS BIGINT) AS dig_replica
        |  FROM h WHERE o_orderkey % 1000 <> 7 GROUP BY 1
        |)
        |SELECT f.bucket, n_full, COALESCE(n_replica, 0) AS n_replica,
        |  dig_full, COALESCE(dig_replica, 0) AS dig_replica
        |FROM f LEFT JOIN rep ON rep.bucket = f.bucket
        |WHERE dig_full <> COALESCE(dig_replica, 0)
        |ORDER BY f.bucket""".stripMargin,

    "q278_erasure_audit" ->
      """WITH dl AS (
        |  SELECT DISTINCT user_id AS k FROM events
        |  WHERE (CAST(md5_number_upper(CAST(user_id AS VARCHAR))
        |    AS HUGEINT) % 2305843009213693951) % 97 = 0
        |)
        |SELECT * FROM (
        |  SELECT 'events' AS table_name,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows_referencing,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_keys
        |  FROM events WHERE user_id IN (SELECT k FROM dl)
        |  UNION ALL
        |  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
        |  FROM orders WHERE o_custkey IN (SELECT k FROM dl)
        |  UNION ALL
        |  SELECT 'customer', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
        |  FROM customer WHERE c_custkey IN (SELECT k FROM dl)
        |  UNION ALL
        |  SELECT '_deletion_list', CAST(COUNT(*) AS BIGINT),
        |    CAST(COUNT(*) AS BIGINT)
        |  FROM dl
        |) ORDER BY table_name""".stripMargin,

    "q279_incremental_state" ->
      """SELECT user_id, event_id, ts_us, event_type FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q280_pit_features" ->
      """SELECT event_id, user_id, us, n_prior_7d,
        |  CAST(sum_prior_7d AS DOUBLE) AS sum_prior_7d,
        |  n_prior_purchases
        |FROM (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n_prior_7d,
        |    COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w
        |      AS DECIMAL(38,2)), CAST(0 AS DECIMAL(38,2)))
        |      AS sum_prior_7d,
        |    COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) OVER w AS BIGINT), 0) AS n_prior_purchases
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
        |) WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q281_calendarize" ->
      """WITH ls AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    CAST(max(l_shipdate) AS DATE) AS last_ship
        |  FROM lineitem GROUP BY 1
        |), spans AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CAST(o_orderdate AS DATE) AS d0,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(date_diff('day', CAST(o_orderdate AS DATE), last_ship)
        |        + 1 AS BIGINT)) AS n_days
        |  FROM orders JOIN ls USING (o_orderkey)
        |), alloc AS (
        |  SELECT d0 + CAST(i AS INTEGER) AS day,
        |    CAST(floor(CAST(cents AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      AS BIGINT)
        |      + (CASE WHEN i < cents % n_days THEN 1 ELSE 0 END)
        |      AS alloc_cents
        |  FROM spans, LATERAL unnest(range(0, n_days)) AS u(i)
        |)
        |SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS month,
        |  CAST(SUM(alloc_cents) AS DOUBLE) / 100.0 AS allocated,
        |  CAST(COUNT(*) AS BIGINT) AS n_order_days
        |FROM alloc GROUP BY 1 ORDER BY month""".stripMargin,

    "q282_rendezvous_hash" ->
      """WITH keyed AS (
        |  SELECT doc_id, s,
        |    CAST(CAST(md5_number_upper(concat_ws('#', doc_id, s))
        |      AS HUGEINT) % 2305843009213693951 AS BIGINT) AS h
        |  FROM documents
        |  CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS s)
        |), assigned AS (
        |  SELECT doc_id,
        |    CAST((max(struct_pack(h := h, s := s))).s AS BIGINT) AS s8,
        |    CAST((max(CASE WHEN s <> 3
        |      THEN struct_pack(h := h, s := s) END)).s AS BIGINT) AS s7
        |  FROM keyed GROUP BY 1
        |)
        |SELECT s7 AS shard,
        |  CAST(SUM(CASE WHEN s8 = s7 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_stayed,
        |  CAST(SUM(CASE WHEN s8 = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_moved_from_removed,
        |  CAST(SUM(CASE WHEN s8 <> 3 AND s8 <> s7 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved_from_surviving,
        |  CAST(COUNT(*) AS BIGINT) AS n_after
        |FROM assigned GROUP BY 1 ORDER BY shard""".stripMargin,

    "q283_item_cf" ->
      """WITH bought AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey, l_partkey
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), ni AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_cust
        |  FROM bought GROUP BY 1
        |), pairs AS (
        |  SELECT a.l_partkey AS i, b.l_partkey AS j,
        |    CAST(COUNT(*) AS BIGINT) AS cooc
        |  FROM bought a JOIN bought b ON b.o_custkey = a.o_custkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |), scored AS (
        |  SELECT i, j, cooc, ni_i.n_cust AS n_i, ni_j.n_cust AS n_j,
        |    CAST(cooc AS DOUBLE) / sqrt(CAST(ni_i.n_cust AS DOUBLE)
        |      * CAST(ni_j.n_cust AS DOUBLE)) AS sim
        |  FROM pairs JOIN ni ni_i ON ni_i.l_partkey = i
        |  JOIN ni ni_j ON ni_j.l_partkey = j
        |)
        |SELECT i, j, cooc, n_i, n_j, round(sim, 6) AS cosine_sim
        |FROM scored ORDER BY sim DESC, i, j LIMIT 20""".stripMargin,

    "q284_nelson_aalen" ->
      """WITH purch AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
        |  WHERE event_type = 'purchase'
        |), gaps AS (
        |  SELECT CAST(floor(CAST(us - prev_us AS DOUBLE)
        |    / 86400000000.0) AS BIGINT) AS gap_days
        |  FROM (SELECT us, lag(us) OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS prev_us
        |        FROM purch)
        |  WHERE prev_us IS NOT NULL
        |), grain AS (
        |  SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS d
        |  FROM gaps GROUP BY 1
        |), tot AS (SELECT CAST(SUM(d) AS BIGINT) AS n_tot FROM grain),
        |wr AS (
        |  SELECT gap_days, d, n_tot,
        |    CAST(SUM(d) OVER (ORDER BY gap_days ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_d
        |  FROM grain CROSS JOIN tot
        |), inc AS (
        |  SELECT gap_days, d, n_tot - cum_d + d AS n_at_risk,
        |    CAST(round(CAST(d AS DOUBLE)
        |      / CAST(n_tot - cum_d + d AS DOUBLE), 12)
        |      AS DECIMAL(27,12)) AS inc
        |  FROM wr
        |)
        |SELECT gap_days, d, n_at_risk,
        |  round(CAST(inc AS DOUBLE), 9) AS hazard_increment,
        |  round(CAST(CAST(SUM(inc) OVER (ORDER BY gap_days
        |    ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,12)) AS DOUBLE), 6)
        |    AS cum_hazard
        |FROM inc ORDER BY gap_days""".stripMargin,

    "q285_sprt" -> Oracles.sprtSql,

    "q286_best_streak" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(38,0))) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), seq AS (
        |  SELECT d, cents,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        |  FROM daily
        |), tot AS (
        |  SELECT CAST(SUM(cents) AS BIGINT) AS c_tot,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM seq
        |), based AS (
        |  SELECT d, t, cents - CAST(floor(CAST(c_tot AS DOUBLE)
        |    / CAST(n_days AS DOUBLE)) AS BIGINT) AS dev
        |  FROM seq CROSS JOIN tot
        |), path AS (
        |  SELECT d, t,
        |    CAST(SUM(dev) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS p
        |  FROM based
        |), path2 AS (
        |  SELECT d, t, p,
        |    least(CAST(0 AS BIGINT), COALESCE(min(p) OVER
        |      (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |       AND 1 PRECEDING), 0)) AS pmin_before
        |  FROM path
        |), best AS (
        |  SELECT t AS t_end, d AS end_day,
        |    p - pmin_before AS streak_cents, pmin_before
        |  FROM path2
        |  QUALIFY row_number() OVER (ORDER BY p - pmin_before DESC, t) = 1
        |), st AS (
        |  SELECT t_end, end_day, streak_cents,
        |    COALESCE(min(p2.t) + 1, 1) AS t_start
        |  FROM best LEFT JOIN path2 p2
        |    ON p2.p = best.pmin_before AND p2.t < best.t_end
        |  GROUP BY 1, 2, 3
        |)
        |SELECT t_start, t_end, t_end - t_start + 1 AS n_days,
        |  streak_cents,
        |  CAST(streak_cents AS DOUBLE) / 100.0 AS streak_above_baseline
        |FROM st ORDER BY t_start""".stripMargin,

    "q287_weighted_reservoir" ->
      """WITH keyed AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
        |    CAST(CAST(md5_number_upper('wr#' || CAST(doc_id AS VARCHAR))
        |      AS HUGEINT) % 2305843009213693951 AS BIGINT) AS h
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, w,
        |    ln((CAST(h AS DOUBLE) + 1.0)
        |      / (2305843009213693951.0 + 1.0)) / w AS key
        |  FROM keyed
        |)
        |SELECT doc_id, CAST(w AS BIGINT) AS weight,
        |  round(key * 1000000.0, 6) AS key_x1e6
        |FROM scored ORDER BY key DESC, doc_id LIMIT 20""".stripMargin,

    "q288_reconciliation" ->
      """WITH om AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |      AS month,
        |    o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS tp
        |  FROM orders
        |), header AS (
        |  SELECT month, CAST(SUM(tp) AS DECIMAL(38,2)) AS header_total,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM om GROUP BY 1
        |), lines AS (
        |  SELECT month,
        |    CAST(SUM(CAST(
        |      CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(CAST(1 AS DECIMAL(4,3))
        |          - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(6,3))
        |        AS DECIMAL(28,5))
        |      * CAST(CAST(1 AS DECIMAL(4,3))
        |        + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(6,3))
        |      AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS line_total
        |  FROM lineitem
        |  JOIN om ON om.o_orderkey = l_orderkey
        |  GROUP BY 1
        |)
        |SELECT month, n_orders,
        |  CAST(header_total AS DOUBLE) AS header_total,
        |  round(CAST(line_total AS DOUBLE), 2) AS line_total,
        |  round(CAST(header_total AS DOUBLE)
        |    - CAST(line_total AS DOUBLE), 2) AS difference,
        |  round((CAST(header_total AS DOUBLE)
        |    - CAST(line_total AS DOUBLE))
        |    / CAST(header_total AS DOUBLE) * 100.0, 6) AS diff_pct
        |FROM header JOIN lines USING (month)
        |ORDER BY month""".stripMargin,

    "q289_runs_test" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(38,0))) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |), grain AS (
        |  SELECT cents, CAST(COUNT(*) AS BIGINT) AS n_v
        |  FROM daily GROUP BY 1
        |), cumg AS (
        |  SELECT cents, CAST(SUM(n_v) OVER (ORDER BY cents
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM grain
        |), nall AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n_all FROM grain),
        |med AS (
        |  SELECT MIN(cents) AS median_cents
        |  FROM cumg CROSS JOIN nall WHERE cum * 2 >= n_all
        |), signed AS (
        |  SELECT d, cents, median_cents,
        |    CASE WHEN cents > median_cents THEN 1 ELSE 0 END AS above,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        |  FROM daily CROSS JOIN med
        |  WHERE cents <> median_cents
        |), runs AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> above THEN 1
        |      ELSE 0 END) AS BIGINT) AS n_runs,
        |    CAST(SUM(above) AS BIGINT) AS n1,
        |    CAST(SUM(1 - above) AS BIGINT) AS n2,
        |    max(median_cents) AS median_cents
        |  FROM (SELECT above, median_cents,
        |          lag(above) OVER (ORDER BY t) AS prev
        |        FROM signed)
        |), md AS (
        |  SELECT n_runs, n1, n2, median_cents,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nd
        |  FROM runs
        |)
        |SELECT n_runs, n1, n2,
        |  CAST(median_cents AS DOUBLE) / 100.0 AS median_revenue,
        |  round(2.0 * n1d * n2d / nd + 1.0, 6) AS expected_runs,
        |  round((CAST(n_runs AS DOUBLE) - (2.0 * n1d * n2d / nd + 1.0))
        |    / sqrt(2.0 * n1d * n2d * (2.0 * n1d * n2d - n1d - n2d)
        |      / (nd * nd * (nd - 1.0))), 6) AS z_score
        |FROM md""".stripMargin,

    "q290_gains_table" ->
      """WITH grain AS (
        |  SELECT CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n_v,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p_v
        |  FROM events GROUP BY 1
        |), cum AS (
        |  SELECT v, n_v, p_v,
        |    CAST(SUM(n_v) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM grain
        |), tot AS (
        |  SELECT CAST(SUM(n_v) AS BIGINT) AS n_tot,
        |    CAST(SUM(p_v) AS BIGINT) AS p_tot
        |  FROM grain
        |), dec AS (
        |  SELECT CAST(floor(CAST((cum - 1) * 10 AS DOUBLE)
        |      / CAST(n_tot AS DOUBLE)) + 1 AS BIGINT) AS decile,
        |    CAST(SUM(n_v) AS BIGINT) AS n_rows,
        |    CAST(SUM(p_v) AS BIGINT) AS n_pos,
        |    max(n_tot) AS n_tot, max(p_tot) AS p_tot
        |  FROM cum CROSS JOIN tot GROUP BY 1
        |), c2 AS (
        |  SELECT decile, n_rows, n_pos, n_tot, p_tot,
        |    CAST(SUM(n_rows) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rows,
        |    CAST(SUM(n_pos) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
        |  FROM dec
        |)
        |SELECT decile, n_rows, n_pos,
        |  round(CAST(cum_pos AS DOUBLE) / CAST(p_tot AS DOUBLE), 6)
        |    AS cum_capture,
        |  round((CAST(cum_pos AS DOUBLE) / CAST(cum_rows AS DOUBLE))
        |    / (CAST(p_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)), 6)
        |    AS cum_lift
        |FROM c2 ORDER BY decile""".stripMargin,

    "q291_tail_dependence" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS y
        |  FROM events GROUP BY 1
        |), qx AS (
        |  SELECT MIN(x) AS q90_x FROM (
        |    SELECT x, CAST(SUM(n_v) OVER (ORDER BY x
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |      SUM(n_v) OVER () AS n_all
        |    FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_v
        |          FROM daily GROUP BY 1)
        |  ) WHERE cum * 10 >= n_all * 9
        |), qy AS (
        |  SELECT MIN(y) AS q90_y FROM (
        |    SELECT y, CAST(SUM(n_v) OVER (ORDER BY y
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |      SUM(n_v) OVER () AS n_all
        |    FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS n_v
        |          FROM daily GROUP BY 1)
        |  ) WHERE cum * 10 >= n_all * 9
        |), counts AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(CASE WHEN x > q90_x THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_x_tail,
        |    CAST(SUM(CASE WHEN y > q90_y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_y_tail,
        |    CAST(SUM(CASE WHEN x > q90_x AND y > q90_y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_joint
        |  FROM daily CROSS JOIN qx CROSS JOIN qy
        |)
        |SELECT n_days, n_x_tail, n_y_tail, n_joint,
        |  round(CAST(n_joint AS DOUBLE) / CAST(n_y_tail AS DOUBLE), 6)
        |    AS lambda_u,
        |  round(CAST(n_x_tail AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |    AS independence_baseline
        |FROM counts""".stripMargin,

    "q292_blocking_audit" ->
      s"""WITH ${Oracles.minhashPairCtes},
        |tr0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM documents a JOIN documents b
        |    ON a.lang = b.lang AND a.doc_id < b.doc_id
        |    AND abs(a.n_chars - b.n_chars) <= 16
        |), truth AS MATERIALIZED (
        |  SELECT id_a, id_b FROM tr0
        |  JOIN sh sa ON sa.doc_id = id_a
        |  JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
        |    / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), snk AS (
        |  SELECT doc_id, substring(trim(regexp_replace(regexp_replace(
        |    lower(text), '[^\\p{L}\\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')),
        |    1, 24) AS sk
        |  FROM documents
        |), snr AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY sk, doc_id) AS BIGINT) AS rnk
        |  FROM snk
        |), sncand AS MATERIALIZED (
        |  SELECT least(a.doc_id, b.doc_id) AS id_a,
        |    greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM snr a JOIN snr b ON b.rnk - a.rnk BETWEEN 1 AND 3
        |), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        |res AS (
        |  SELECT 'minhash_lsh' AS blocker,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
        |    (SELECT n_truth FROM nt) AS n_truth,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        |     WHERE EXISTS (SELECT 1 FROM cand c
        |       WHERE c.id_a = t.id_a AND c.id_b = t.id_b)) AS n_hit
        |  UNION ALL
        |  SELECT 'sorted_neighborhood',
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM sncand),
        |    (SELECT n_truth FROM nt),
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        |     WHERE EXISTS (SELECT 1 FROM sncand c
        |       WHERE c.id_a = t.id_a AND c.id_b = t.id_b))
        |)
        |SELECT blocker, n_candidates, n_truth, n_hit,
        |  round(CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
        |    AS recall,
        |  round(CAST(n_truth AS DOUBLE) / CAST(n_candidates AS DOUBLE), 6)
        |    AS efficiency
        |FROM res ORDER BY blocker""".stripMargin,

    "q293_disparate_impact" ->
      """WITH bl AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_sel
        |  FROM documents GROUP BY 1
        |), rk AS (
        |  SELECT *, CAST(n_sel AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |    row_number() OVER (ORDER BY
        |      CAST(n_sel AS DOUBLE) / CAST(n AS DOUBLE) DESC, lang) AS rn
        |  FROM bl
        |), ref AS (
        |  SELECT lang AS ref_lang, rate AS ref_rate FROM rk WHERE rn = 1
        |)
        |SELECT lang, n, n_sel, round(rate, 6) AS selection_rate,
        |  ref_lang, round(rate / ref_rate, 6) AS impact_ratio,
        |  (rate / ref_rate < 0.8) AS fails_80_rule
        |FROM rk CROSS JOIN ref ORDER BY lang""".stripMargin,

    "q294_leaderboard_drift" ->
      """WITH weekly AS (
        |  SELECT CAST(floor(CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(l_shipdate AS DATE)) AS DOUBLE) / 7.0) AS BIGINT)
        |      AS week,
        |    l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(CAST(1 AS DECIMAL(4,3))
        |        - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(6,3))
        |      AS DECIMAL(28,5))) AS DECIMAL(38,5)) AS rev
        |  FROM lineitem GROUP BY 1, 2
        |), top5 AS (
        |  SELECT week, l_partkey, rev FROM (
        |    SELECT *, row_number() OVER (PARTITION BY week
        |      ORDER BY rev DESC, l_partkey) AS rn
        |    FROM weekly) WHERE rn <= 5
        |), agg AS (
        |  SELECT week, list_sort(list(l_partkey)) AS top_parts,
        |    CAST(max(rev) AS DOUBLE) AS top_rev
        |  FROM top5 GROUP BY 1
        |)
        |SELECT a.week,
        |  array_to_string(a.top_parts, ',') AS top_parts_csv,
        |  round(a.top_rev, 2) AS top_rev,
        |  CASE WHEN p.top_parts IS NOT NULL
        |    THEN CAST(len(list_intersect(a.top_parts, p.top_parts))
        |      AS BIGINT) END AS overlap_with_prev
        |FROM agg a LEFT JOIN agg p ON p.week = a.week - 1
        |ORDER BY a.week""".stripMargin,

    // q295-q297 are gated against DuckDB's NATIVE string-similarity
    // functions (jaro_similarity / jaro_winkler_similarity /
    // damerau_levenshtein) — an independent engine's implementation of
    // the same published algorithms, not an echo of our formula.
    "q295_jaro_vocab" ->
      s"""WITH $bigramVocabSql,
         |v AS (SELECT s, substr(s, 1, 1) AS blk, len(s) AS ln FROM bg)
         |SELECT a.s AS a, b.s AS b,
         |  round(jaro_similarity(a.s, b.s), 6) AS jaro,
         |  round(jaro_winkler_similarity(a.s, b.s), 6) AS jw
         |FROM v a JOIN v b
         |  ON a.blk = b.blk AND a.s < b.s AND abs(a.ln - b.ln) <= 4
         |WHERE round(jaro_winkler_similarity(a.s, b.s), 6) >= 0.88
         |ORDER BY a, b""".stripMargin,

    "q296_damerau_typos" ->
      s"""WITH $bigramVocabSql,
         |v AS (
         |  SELECT s, CAST(1 + (CAST(md5_number_upper('typo#' || s)
         |      AS HUGEINT) % 2305843009213693951) % (len(s) - 1)
         |    AS INT) AS pos
         |  FROM bg WHERE len(s) >= 4
         |), t AS (
         |  SELECT s, substr(s, 1, pos - 1) || substr(s, pos + 1, 1)
         |    || substr(s, pos, 1) || substr(s, pos + 2) AS typo
         |  FROM v
         |)
         |SELECT s, typo,
         |  CAST(levenshtein(s, typo) AS BIGINT) AS lev,
         |  CAST(damerau_levenshtein(s, typo) AS BIGINT) AS dl,
         |  CAST(levenshtein(s, typo) - damerau_levenshtein(s, typo)
         |    AS BIGINT) AS transposition_gain
         |FROM t ORDER BY s""".stripMargin,

    "q297_linkage_score" ->
      """WITH sample AS (
        |  SELECT p_partkey, p_name, p_brand, p_size FROM part
        |  WHERE p_partkey % 7 = 0
        |), pre AS (
        |  SELECT p_partkey, p_name, p_brand, p_size,
        |    CAST(1 + (CAST(md5_number_upper('typo#' || p_name)
        |        AS HUGEINT) % 2305843009213693951) % (len(p_name) - 1)
        |      AS INT) AS pos
        |  FROM sample
        |), dirty AS (
        |  SELECT p_partkey AS d_key, p_brand AS d_brand,
        |    substr(p_name, 1, pos - 1) || substr(p_name, pos + 1, 1)
        |      || substr(p_name, pos, 1) || substr(p_name, pos + 2) AS d_name,
        |    p_size + CASE WHEN (CAST(md5_number_upper('sz#' || p_partkey)
        |        AS HUGEINT) % 2305843009213693951) % 3 = 0
        |      THEN 1 ELSE 0 END AS d_size
        |  FROM pre
        |), scored AS (
        |  SELECT a.p_partkey, b.d_key,
        |    CAST(CASE WHEN jaro_winkler_similarity(a.p_name, b.d_name)
        |        >= 0.95 THEN CAST('4.00' AS DECIMAL(4,2))
        |      ELSE CAST('-2.00' AS DECIMAL(4,2)) END
        |    + CASE WHEN abs(a.p_size - b.d_size) <= 1
        |        THEN CAST('1.00' AS DECIMAL(4,2))
        |      ELSE CAST('-1.50' AS DECIMAL(4,2)) END
        |    + CASE WHEN string_split(a.p_name, ' ')[1]
        |          = string_split(b.d_name, ' ')[1]
        |        THEN CAST('1.50' AS DECIMAL(4,2))
        |      ELSE CAST('-1.00' AS DECIMAL(4,2)) END AS DECIMAL(6,2))
        |      AS score
        |  FROM sample a JOIN dirty b
        |    ON a.p_brand = b.d_brand
        |    AND substr(a.p_name, 1, 1) = substr(b.d_name, 1, 1)
        |), classed AS (
        |  SELECT *, CASE WHEN score >= CAST('6.00' AS DECIMAL(4,2))
        |      THEN 'match'
        |    WHEN score >= CAST('3.50' AS DECIMAL(4,2)) THEN 'possible'
        |    ELSE 'non_match' END AS decision
        |  FROM scored
        |)
        |SELECT decision,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN p_partkey = d_key THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_true,
        |  round(CAST(SUM(CASE WHEN p_partkey = d_key THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS precision
        |FROM classed GROUP BY decision ORDER BY decision""".stripMargin,

    // q298: the bucket index is the integer bit length of the cents value
    // (printf('%b') length here, length(bin()) in Spark) — zero FP in the
    // sketch, so the oracle replays it exactly, guarantee included.
    "q298_log2_quantile_sketch" ->
      """WITH vals AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders
        |), vb AS (
        |  SELECT prio, cents,
        |    CAST(length(printf('%b', cents)) AS INT) AS bucket
        |  FROM vals WHERE cents > 0
        |), per_prio AS (
        |  SELECT prio, bucket, COUNT(*) AS c FROM vb GROUP BY 1, 2
        |), merged AS (
        |  SELECT bucket, SUM(c) AS c_merged FROM per_prio GROUP BY 1
        |), direct AS (
        |  SELECT bucket, COUNT(*) AS c_direct FROM vb GROUP BY 1
        |), mok AS (
        |  SELECT min(coalesce(c_merged = c_direct, false)) AS merged_ok
        |  FROM merged FULL JOIN direct USING (bucket)
        |), nn AS (SELECT COUNT(*) AS n FROM vb),
        |byval AS (SELECT cents, COUNT(*) AS cv FROM vb GROUP BY 1),
        |cumv AS (
        |  SELECT cents, SUM(cv) OVER (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM byval
        |), cumb AS (
        |  SELECT bucket, SUM(c_direct) OVER (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM direct
        |), phis AS (
        |  SELECT * FROM (VALUES ('0.50', 1, 2), ('0.90', 9, 10),
        |    ('0.99', 99, 100)) AS t(phi, num, den)
        |), r AS (
        |  SELECT phi, n, CAST((n * num + den - 1) // den AS BIGINT) AS rank
        |  FROM phis, nn
        |), bsel AS (
        |  SELECT phi, r.n, rank, MIN(bucket) AS bucket
        |  FROM r JOIN cumb ON cumb >= rank GROUP BY 1, 2, 3
        |), esel AS (
        |  SELECT phi, CAST(MIN(cents) AS BIGINT) AS exact_cents
        |  FROM r JOIN cumv ON cum >= rank GROUP BY 1
        |)
        |SELECT b.phi, b.n, b.rank, b.bucket,
        |  CAST(1 AS BIGINT) << (b.bucket - 1) AS lo_cents,
        |  (CAST(1 AS BIGINT) << b.bucket) - 1 AS hi_cents,
        |  e.exact_cents,
        |  (SELECT merged_ok FROM mok) AS merged_ok,
        |  e.exact_cents >= (CAST(1 AS BIGINT) << (b.bucket - 1))
        |    AND e.exact_cents <= (CAST(1 AS BIGINT) << b.bucket) - 1
        |    AS within_bucket
        |FROM bsel b JOIN esel e USING (phi) ORDER BY b.phi""".stripMargin,

    // q299: PAVA via the minimax identity on bounded bucket triples;
    // pooled averages are integer-count ratios → bit-identical doubles.
    "q299_isotonic_calibration" ->
      """WITH buckets AS (
        |  SELECT LEAST(19, n_chars // 50) AS bucket,
        |    COUNT(*) AS n,
        |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS s
        |  FROM documents GROUP BY 1
        |), pre AS (
        |  SELECT bucket, n, s,
        |    SUM(n) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |    SUM(s) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM buckets
        |), iv AS (
        |  SELECT j.bucket AS j, k.bucket AS k,
        |    CAST(k.cs - (j.cs - j.s) AS DOUBLE)
        |      / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS avg_jk
        |  FROM pre j JOIN pre k ON j.bucket <= k.bucket
        |), iso AS (
        |  SELECT i, MAX(mn) AS iso FROM (
        |    SELECT b.bucket AS i, iv.j, MIN(iv.avg_jk) AS mn
        |    FROM iv JOIN buckets b
        |      ON iv.j <= b.bucket AND b.bucket <= iv.k
        |    GROUP BY 1, 2) GROUP BY 1
        |), joined AS (
        |  SELECT b.bucket, CAST(b.n AS BIGINT) AS n,
        |    CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS rate, iso.iso
        |  FROM buckets b JOIN iso ON iso.i = b.bucket
        |)
        |SELECT CAST(bucket AS INT) AS bucket, n,
        |  round(rate, 6) AS rate, round(iso, 6) AS iso_rate,
        |  coalesce(rate < lag(rate, 1) OVER (ORDER BY bucket), false)
        |    AS pre_violation,
        |  coalesce(iso >= lag(iso, 1) OVER (ORDER BY bucket), true)
        |    AS iso_monotone
        |FROM joined ORDER BY bucket""".stripMargin,

    // q300: forecasts are integer cents (MA-7 floor-divided), MAE exact,
    // MAPE through the q272 rounded-term DECIMAL reduction.
    "q300_forecast_backtest" -> {
      def score(fc: String): String =
        s"""SELECT '$fc' AS forecaster,
           |  CAST(COUNT(*) AS BIGINT) AS n_origins,
           |  round(CAST(SUM(abs(rev - $fc)) AS DOUBLE)
           |    / CAST(COUNT(*) AS DOUBLE), 2) AS mae_cents,
           |  round(CAST(SUM(CAST(round(CAST(abs(rev - $fc) AS DOUBLE)
           |      / CAST(rev AS DOUBLE), 12) AS DECIMAL(24,12))) AS DOUBLE)
           |    / CAST(COUNT(*) AS DOUBLE), 8) AS mape
           |FROM f""".stripMargin
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1
         |), wf AS (
         |  SELECT day, rev,
         |    row_number() OVER (ORDER BY day) AS rn,
         |    lag(rev, 1) OVER (ORDER BY day) AS naive,
         |    lag(rev, 7) OVER (ORDER BY day) AS seasonal,
         |    (SUM(rev) OVER (ORDER BY day
         |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) // 7 AS ma7
         |  FROM daily
         |), f AS (SELECT * FROM wf WHERE rn >= 8)
         |${score("naive")}
         |UNION ALL ${score("seasonal")}
         |UNION ALL ${score("ma7")}
         |ORDER BY forecaster""".stripMargin
    },

    // q301: ε-graph recomputed as a plain quadratic join over the bounded
    // point set (the Spark side grid-blocks); CC as a recursive CTE.
    "q301_dbscan_regimes" ->
      """WITH RECURSIVE wk AS (
        |  SELECT date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) // 7 AS x,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS rev
        |  FROM orders GROUP BY 1
        |), nn AS (SELECT COUNT(*) AS nw FROM wk),
        |pp AS (
        |  SELECT CAST(x AS BIGINT) AS x,
        |    CAST(((row_number() OVER (ORDER BY rev, x)) - 1) * 20 // nw
        |      AS BIGINT) AS y,
        |    CAST(x * 32 + ((row_number() OVER (ORDER BY rev, x)) - 1)
        |      * 20 // nw AS BIGINT) AS pid
        |  FROM wk, nn
        |), e AS (
        |  SELECT a.pid AS pa, b.pid AS pb FROM pp a JOIN pp b
        |  ON abs(a.x - b.x) <= 2 AND abs(a.y - b.y) <= 2
        |    AND a.pid <> b.pid
        |), deg AS (SELECT pa, COUNT(*) AS nb FROM e GROUP BY 1),
        |core AS (SELECT pa AS pid FROM deg WHERE nb >= 3),
        |ce AS (
        |  SELECT e.pa, e.pb FROM e
        |  JOIN core c1 ON c1.pid = e.pa JOIN core c2 ON c2.pid = e.pb
        |), reach(node, r) AS (
        |  SELECT pa, pa FROM ce
        |  UNION
        |  SELECT ce.pa, re.r FROM ce JOIN reach re ON re.node = ce.pb
        |), compe AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
        |comp AS (
        |  SELECT c.pid, COALESCE(x2.comp, c.pid) AS cluster_id
        |  FROM core c LEFT JOIN compe x2 ON x2.node = c.pid
        |), border AS (
        |  SELECT e.pa, MIN(comp.cluster_id) AS b_cluster
        |  FROM e JOIN comp ON comp.pid = e.pb
        |  WHERE e.pa NOT IN (SELECT pid FROM core)
        |  GROUP BY e.pa
        |)
        |SELECT pp.pid, pp.x, pp.y,
        |  CASE WHEN comp.pid IS NOT NULL THEN 'core'
        |    WHEN border.pa IS NOT NULL THEN 'border'
        |    ELSE 'noise' END AS role,
        |  CAST(CASE WHEN comp.pid IS NOT NULL THEN comp.cluster_id
        |    ELSE border.b_cluster END AS BIGINT) AS cluster_id
        |FROM pp LEFT JOIN comp ON comp.pid = pp.pid
        |LEFT JOIN border ON border.pa = pp.pid
        |ORDER BY pp.pid""".stripMargin,

    // q302: exact integer path counts — no normalization, no FP.
    "q302_hits_bipartite" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), a1 AS (SELECT p, COUNT(*) AS a1 FROM e GROUP BY 1),
        |h1 AS (
        |  SELECT c, CAST(SUM(a1) AS BIGINT) AS h1
        |  FROM e JOIN a1 USING (p) GROUP BY 1
        |), a2 AS (
        |  SELECT p, CAST(SUM(h1) AS BIGINT) AS a2
        |  FROM e JOIN h1 USING (c) GROUP BY 1
        |)
        |SELECT p AS partkey, CAST(a1.a1 AS BIGINT) AS a1, a2.a2
        |FROM a1 JOIN a2 USING (p)
        |ORDER BY a2.a2 DESC, p LIMIT 15""".stripMargin,

    // q303: both channels and all estimator terms replayed exactly; the
    // per-stratum terms fold through the q272 rounded-term reduction.
    "q303_ipw_stratified" ->
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey AS stratum,
        |    CASE WHEN (CAST(md5_number_upper('trt#'
        |        || CAST(c_custkey AS VARCHAR)) AS HUGEINT)
        |        % 2305843009213693951) % 100
        |      < 20 + 3 * (c_nationkey % 10) THEN 1 ELSE 0 END AS t
        |  FROM customer
        |), base2 AS (
        |  SELECT *, CASE WHEN (CAST(md5_number_upper('out#'
        |        || CAST(c_custkey AS VARCHAR)) AS HUGEINT)
        |        % 2305843009213693951) % 100
        |      < 10 + 2 * (stratum % 10) + 15 * t THEN 1 ELSE 0 END AS y
        |  FROM base
        |), strata AS (
        |  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS ns,
        |    CAST(SUM(t) AS BIGINT) AS nt,
        |    CAST(SUM(y * t) AS BIGINT) AS yt,
        |    CAST(SUM(y * (1 - t)) AS BIGINT) AS yc
        |  FROM base2 GROUP BY 1
        |), s2 AS (SELECT *, ns - nt AS nc FROM strata),
        |ok AS (SELECT * FROM s2 WHERE nt > 0 AND nc > 0),
        |exc AS (
        |  SELECT CAST(COALESCE(SUM(ns), 0) AS BIGINT) AS n_excluded
        |  FROM s2 WHERE NOT (nt > 0 AND nc > 0)
        |), terms AS (
        |  SELECT ns, nt, nc, yt, yc,
        |    CAST(round(CAST(ns AS DOUBLE) * (CAST(yt AS DOUBLE)
        |      / CAST(nt AS DOUBLE) - CAST(yc AS DOUBLE)
        |      / CAST(nc AS DOUBLE)), 12) AS DECIMAL(24,12)) AS strat_term,
        |    CAST(round(CAST(yt AS DOUBLE) / (CAST(nt AS DOUBLE)
        |      / CAST(ns AS DOUBLE)), 12) AS DECIMAL(24,12)) AS ht_t_term,
        |    CAST(round(CAST(yc AS DOUBLE) / (CAST(nc AS DOUBLE)
        |      / CAST(ns AS DOUBLE)), 12) AS DECIMAL(24,12)) AS ht_c_term
        |  FROM ok
        |), agg AS (
        |  SELECT CAST(SUM(ns) AS BIGINT) AS n,
        |    CAST(SUM(nt) AS BIGINT) AS n_treated,
        |    CAST(SUM(yt) AS BIGINT) AS conv_treated,
        |    CAST(SUM(nc) AS BIGINT) AS n_control,
        |    CAST(SUM(yc) AS BIGINT) AS conv_control,
        |    SUM(strat_term) AS strat_sum,
        |    SUM(ht_t_term) AS ht_t_sum,
        |    SUM(ht_c_term) AS ht_c_sum
        |  FROM terms
        |)
        |SELECT n, (SELECT n_excluded FROM exc) AS n_excluded,
        |  round(CAST(conv_treated AS DOUBLE) / CAST(n_treated AS DOUBLE)
        |    - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE), 6)
        |    AS naive_diff,
        |  round(CAST(strat_sum AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS stratified_ate,
        |  round((CAST(ht_t_sum AS DOUBLE) - CAST(ht_c_sum AS DOUBLE))
        |    / CAST(n AS DOUBLE), 6) AS ipw_ate
        |FROM agg""".stripMargin,

    // q304: bounded brand-itemset grain; top-20 by (support, triple).
    "q304_frequent_triples" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |), nb AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM b),
        |singles AS (SELECT brand, COUNT(*) AS supp1 FROM b GROUP BY 1),
        |pairs AS (
        |  SELECT a.brand AS x, c.brand AS y, COUNT(*) AS supp_xy
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.brand < c.brand
        |  GROUP BY 1, 2
        |), triples AS (
        |  SELECT a.brand AS x, c.brand AS y, d.brand AS z,
        |    CAST(COUNT(*) AS BIGINT) AS supp
        |  FROM b a JOIN b c ON a.ok = c.ok AND a.brand < c.brand
        |  JOIN b d ON a.ok = d.ok AND c.brand < d.brand
        |  GROUP BY 1, 2, 3
        |), top AS (
        |  SELECT * FROM triples ORDER BY supp DESC, x, y, z LIMIT 20
        |)
        |SELECT t.x, t.y, t.z, t.supp,
        |  CAST(p.supp_xy AS BIGINT) AS supp_xy,
        |  round(CAST(t.supp AS DOUBLE) / CAST(p.supp_xy AS DOUBLE), 6)
        |    AS confidence,
        |  round(CAST(t.supp AS DOUBLE) / CAST(p.supp_xy AS DOUBLE)
        |    * CAST(nb.n_baskets AS DOUBLE) / CAST(s.supp1 AS DOUBLE), 6)
        |    AS lift
        |FROM top t JOIN pairs p ON p.x = t.x AND p.y = t.y
        |JOIN singles s ON s.brand = t.z CROSS JOIN nb
        |ORDER BY t.supp DESC, t.x, t.y, t.z""".stripMargin,

    // q305: Morton interleave replayed with the same bit arithmetic.
    "q305_morton_locality" -> {
      val interleave = (0 until 16).map(b =>
        s"(((x >> $b) & 1) << ${2 * b}) + (((y >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      s"""WITH pts AS (
         |  SELECT DISTINCT
         |    CAST(date_diff('day', DATE '1992-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         |    CAST(length(printf('%b',
         |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)))
         |      AS BIGINT) AS y
         |  FROM orders
         |), keyed AS (
         |  SELECT x, y,
         |    row_number() OVER (ORDER BY ($interleave)) AS rm,
         |    row_number() OVER (ORDER BY x * 65536 + y) AS rr
         |  FROM pts
         |), edges AS (
         |  SELECT abs(a.rm - b.rm) AS gm, abs(a.rr - b.rr) AS gr
         |  FROM keyed a JOIN keyed b ON b.x = a.x + 1 AND b.y = a.y
         |  UNION ALL
         |  SELECT abs(a.rm - b.rm), abs(a.rr - b.rr)
         |  FROM keyed a JOIN keyed b ON b.x = a.x AND b.y = a.y + 1
         |)
         |SELECT 'morton' AS ordering, CAST(COUNT(*) AS BIGINT) AS n_edges,
         |  round(CAST(SUM(gm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         |    AS avg_rank_gap,
         |  CAST(MAX(gm) AS BIGINT) AS max_rank_gap
         |FROM edges
         |UNION ALL
         |SELECT 'row_major', CAST(COUNT(*) AS BIGINT),
         |  round(CAST(SUM(gr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4),
         |  CAST(MAX(gr) AS BIGINT)
         |FROM edges
         |ORDER BY ordering""".stripMargin
    },

    // q306: both md5 channels replayed; every quantity an exact integer.
    "q306_ams_f2" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), counts AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST((CAST(md5_number_upper('amsb#' || tok) AS HUGEINT)
        |      % 2305843009213693951) % 16 AS BIGINT) AS bucket,
        |    2 * CAST((CAST(md5_number_upper('amss#' || tok) AS HUGEINT)
        |      % 2305843009213693951) % 2 AS BIGINT) - 1 AS sign
        |  FROM tok GROUP BY source, tok
        |), per_source AS (
        |  SELECT source, bucket, CAST(SUM(sign * c) AS BIGINT) AS z
        |  FROM counts GROUP BY 1, 2
        |), merged AS (
        |  SELECT bucket, CAST(SUM(z) AS BIGINT) AS z_merged
        |  FROM per_source GROUP BY 1
        |), tok_global AS (
        |  SELECT tok, CAST(SUM(c) AS BIGINT) AS c,
        |    MIN(bucket) AS bucket, MIN(sign) AS sign
        |  FROM counts GROUP BY 1
        |), direct AS (
        |  SELECT bucket, CAST(SUM(sign * c) AS BIGINT) AS z_direct
        |  FROM tok_global GROUP BY 1
        |), mok AS (
        |  SELECT min(coalesce(z_merged = z_direct, false)) AS merged_ok
        |  FROM merged FULL JOIN direct USING (bucket)
        |), ex AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |    CAST(SUM(c * c) AS BIGINT) AS f2_exact
        |  FROM tok_global
        |), es AS (
        |  SELECT CAST(SUM(z_direct * z_direct) AS BIGINT) AS f2_est
        |  FROM direct
        |)
        |SELECT n_tokens, n_distinct, f2_exact, f2_est,
        |  round(CAST(f2_est AS DOUBLE) / CAST(f2_exact AS DOUBLE), 6)
        |    AS est_ratio,
        |  (SELECT merged_ok FROM mok) AS merged_ok
        |FROM ex CROSS JOIN es""".stripMargin,

    // q307: hypergeometric E/V at each event day; terms fold through the
    // q272 rounded-term DECIMAL reduction.
    "q307_logrank" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |), per_user AS (
        |  SELECT user_id,
        |    CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN us END)
        |        IS NOT NULL
        |      THEN (MIN(CASE WHEN event_type = 'purchase' THEN us END)
        |        - MIN(us)) // 86400000000
        |      ELSE (MAX(us) - MIN(us)) // 86400000000 END AS t,
        |    CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN us END)
        |      IS NOT NULL THEN 1 ELSE 0 END AS d,
        |    CAST((CAST(md5_number_upper('arm#'
        |      || CAST(user_id AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 2 AS INT) AS arm
        |  FROM ev GROUP BY user_id
        |), by_day AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(d) AS BIGINT) AS dd,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        |    CAST(SUM(d * arm) AS BIGINT) AS d1
        |  FROM per_user GROUP BY 1
        |), risk AS (
        |  SELECT *,
        |    CAST(SUM(m) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n,
        |    CAST(SUM(m1) OVER (ORDER BY t DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n1
        |  FROM by_day
        |), fr AS (SELECT * FROM risk WHERE dd > 0 AND n > 1),
        |terms AS (
        |  SELECT d1, dd,
        |    CAST(round(CAST(dd AS DOUBLE) * (CAST(n1 AS DOUBLE)
        |      / CAST(n AS DOUBLE)), 12) AS DECIMAL(24,12)) AS e1,
        |    CAST(round(CAST(dd AS DOUBLE) * (CAST(n1 AS DOUBLE)
        |      / CAST(n AS DOUBLE)) * (1.0 - CAST(n1 AS DOUBLE)
        |      / CAST(n AS DOUBLE)) * (CAST(n - dd AS DOUBLE)
        |      / CAST(n - 1 AS DOUBLE)), 12) AS DECIMAL(24,12)) AS v
        |  FROM fr
        |), us AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(d) AS BIGINT) AS n_events
        |  FROM per_user
        |), ag AS (
        |  SELECT CAST(SUM(d1) AS BIGINT) AS o1, SUM(e1) AS e1s,
        |    SUM(v) AS vs
        |  FROM terms
        |)
        |SELECT n_users, n_events, o1,
        |  round(CAST(e1s AS DOUBLE), 6) AS e1,
        |  round(CAST(vs AS DOUBLE), 6) AS var_sum,
        |  round((CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE))
        |    * (CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE))
        |    / CAST(vs AS DOUBLE), 6) AS chi2
        |FROM us CROSS JOIN ag""".stripMargin,

    // q308: all Σ are exact integers; the z assembly is a fixed-order
    // double formula.
    "q308_cochran_armitage" ->
      """WITH banded AS (
        |  SELECT LEAST(9, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) // 2500000) AS s,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r
        |  FROM orders
        |), sums AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r) AS BIGINT) AS rr,
        |    CAST(SUM(s) AS BIGINT) AS ssn,
        |    CAST(SUM(s * r) AS BIGINT) AS ssr,
        |    CAST(SUM(s * s) AS BIGINT) AS ss2n
        |  FROM banded
        |)
        |SELECT n, rr AS successes,
        |  round(CAST(ssr AS DOUBLE) - CAST(ssn AS DOUBLE)
        |    * CAST(rr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS t_stat,
        |  round((CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (1.0 - CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(ss2n AS DOUBLE) - CAST(ssn AS DOUBLE)
        |      * CAST(ssn AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS var_t,
        |  round((CAST(ssr AS DOUBLE) - CAST(ssn AS DOUBLE)
        |    * CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt((CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (1.0 - CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(ss2n AS DOUBLE) - CAST(ssn AS DOUBLE)
        |      * CAST(ssn AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS z
        |FROM sums""".stripMargin,

    // q309: per-stratum 2x2 tables exact; MH terms dec12-folded.
    "q309_mantel_haenszel" ->
      """WITH urgent AS (
        |  SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |), base AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS stratum,
        |    CAST((CAST(md5_number_upper('exp#'
        |      || CAST(c.c_custkey AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 2 AS INT) AS e,
        |    CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
        |  FROM customer c LEFT JOIN urgent u ON u.c_custkey = c.c_custkey
        |), tab AS (
        |  SELECT stratum,
        |    CAST(SUM(e * y) AS BIGINT) AS a,
        |    CAST(SUM(e * (1 - y)) AS BIGINT) AS b,
        |    CAST(SUM((1 - e) * y) AS BIGINT) AS c,
        |    CAST(SUM((1 - e) * (1 - y)) AS BIGINT) AS d
        |  FROM base GROUP BY 1
        |), mh AS (
        |  SELECT CAST(SUM(CAST(round(CAST(a * d AS DOUBLE)
        |      / CAST(a + b + c + d AS DOUBLE), 12) AS DECIMAL(24,12)))
        |      AS DECIMAL(38,12)) AS num,
        |    CAST(SUM(CAST(round(CAST(b * c AS DOUBLE)
        |      / CAST(a + b + c + d AS DOUBLE), 12) AS DECIMAL(24,12)))
        |      AS DECIMAL(38,12)) AS den
        |  FROM tab
        |), pooled AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS a, CAST(SUM(b) AS BIGINT) AS b,
        |    CAST(SUM(c) AS BIGINT) AS c, CAST(SUM(d) AS BIGINT) AS d
        |  FROM tab
        |)
        |SELECT stratum, a, b, c, d,
        |  CASE WHEN b * c > 0 THEN round(CAST(a * d AS DOUBLE)
        |    / CAST(b * c AS DOUBLE), 6) END AS odds_ratio,
        |  CAST(NULL AS DOUBLE) AS or_mh,
        |  CAST(NULL AS BOOLEAN) AS simpson_flip
        |FROM tab
        |UNION ALL
        |SELECT '__pooled__', p.a, p.b, p.c, p.d,
        |  CASE WHEN p.b * p.c > 0 THEN round(CAST(p.a * p.d AS DOUBLE)
        |    / CAST(p.b * p.c AS DOUBLE), 6) END,
        |  round(CAST(m.num AS DOUBLE) / CAST(m.den AS DOUBLE), 6),
        |  (CAST(p.a * p.d AS DOUBLE) / CAST(p.b * p.c AS DOUBLE) > 1.0)
        |    <> (CAST(m.num AS DOUBLE) / CAST(m.den AS DOUBLE) > 1.0)
        |FROM pooled p CROSS JOIN mh m
        |ORDER BY stratum""".stripMargin,

    // q310: the ln(2/δ) constant is interpolated from the SAME driver
    // math.log call the Spark side uses (q285 convention).
    "q310_hoeffding_racing" ->
      s"""WITH shards AS (
         |  SELECT CAST((CAST(md5_number_upper('shard#'
         |      || CAST(doc_id AS VARCHAR)) AS HUGEINT)
         |      % 2305843009213693951) % 10 AS BIGINT) AS shard,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents
         |), agg AS (
         |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS ns,
         |    CAST(SUM(y) AS BIGINT) AS ys
         |  FROM shards GROUP BY 1
         |), cum AS (
         |  SELECT shard,
         |    CAST(SUM(ns) OVER (ORDER BY shard
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS n_cum,
         |    CAST(SUM(ys) OVER (ORDER BY shard
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS y_cum
         |  FROM agg
         |), tot AS (
         |  SELECT CAST(SUM(ys) AS DOUBLE) / CAST(SUM(ns) AS DOUBLE)
         |    AS final_mean
         |  FROM agg
         |)
         |SELECT shard, n_cum,
         |  round(CAST(y_cum AS DOUBLE) / CAST(n_cum AS DOUBLE), 6)
         |    AS mean_cum,
         |  round(sqrt(${graft.queries.EvalQueries.ln2OverDelta}
         |    / (2.0 * CAST(n_cum AS DOUBLE))), 6) AS eps,
         |  abs(CAST(y_cum AS DOUBLE) / CAST(n_cum AS DOUBLE) - final_mean)
         |    <= sqrt(${graft.queries.EvalQueries.ln2OverDelta}
         |      / (2.0 * CAST(n_cum AS DOUBLE))) AS within_bound
         |FROM cum CROSS JOIN tot ORDER BY shard""".stripMargin,

    // q311: one aggregate per FD candidate, UNION ALL on the 9-row grain.
    "q311_fd_discovery" -> {
      def probe(tbl: String, lhs: String, rhs: String): String =
        s"""SELECT '$tbl' AS tbl, '$lhs -> $rhs' AS fd,
           |  CAST(COUNT(*) AS BIGINT) AS n_lhs,
           |  CAST(SUM(nr) AS BIGINT) AS n_pairs,
           |  COUNT(*) = SUM(nr) AS holds,
           |  CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating_lhs
           |FROM (SELECT $lhs, COUNT(DISTINCT $rhs) AS nr FROM $tbl
           |  GROUP BY $lhs)""".stripMargin
      Seq(
        probe("part", "p_partkey", "p_name"),
        probe("part", "p_name", "p_brand"),
        probe("part", "p_name", "p_type"),
        probe("orders", "o_orderkey", "o_custkey"),
        probe("orders", "o_custkey", "o_orderpriority"),
        probe("lineitem", "l_orderkey", "l_suppkey"),
        probe("customer", "c_custkey", "c_mktsegment"),
        probe("nation", "n_nationkey", "n_regionkey"),
        probe("supplier", "s_nationkey", "s_name"),
      ).mkString("", "\nUNION ALL ", "\nORDER BY tbl, fd")
    },

    // q312: train on arm 0, test on arm 1; argmax tiebreaks pinned.
    "q312_markov_eval" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CAST((CAST(md5_number_upper('arm#'
        |      || CAST(user_id AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 2 AS INT) AS arm
        |  FROM events
        |), bg AS (
        |  SELECT arm,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev,
        |    event_type AS cur
        |  FROM ev
        |), bigrams AS (SELECT * FROM bg WHERE prev IS NOT NULL),
        |tc AS (
        |  SELECT prev, cur, COUNT(*) AS cnt FROM bigrams
        |  WHERE arm = 0 GROUP BY 1, 2
        |), predicted AS (
        |  SELECT prev, cur AS pred FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prev
        |      ORDER BY cnt DESC, cur) AS rn FROM tc) WHERE rn = 1
        |), maj AS (
        |  SELECT cur AS maj FROM (
        |    SELECT cur, COUNT(*) AS cnt FROM bigrams WHERE arm = 0
        |    GROUP BY 1 ORDER BY cnt DESC, cur LIMIT 1)
        |), test AS (SELECT * FROM bigrams WHERE arm = 1)
        |SELECT 'markov1' AS model,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN p.pred = t.cur THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hits,
        |  round(CAST(SUM(CASE WHEN p.pred = t.cur THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
        |FROM test t LEFT JOIN predicted p ON p.prev = t.prev
        |UNION ALL
        |SELECT 'majority', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN m.maj = t.cur THEN 1 ELSE 0 END) AS BIGINT),
        |  round(CAST(SUM(CASE WHEN m.maj = t.cur THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |FROM test t CROSS JOIN maj m
        |ORDER BY model""".stripMargin,

    // q313: the same three locally-dominant rounds, unrolled as CTEs.
    "q313_dominant_matching" -> {
      def round(in: String, out: String, rnd: Int): String =
        s"""m$rnd AS (
           |  SELECT s, c, w, CAST($rnd AS BIGINT) AS matched_round
           |  FROM (SELECT *,
           |    row_number() OVER (PARTITION BY s ORDER BY w DESC, c)
           |      AS rs,
           |    row_number() OVER (PARTITION BY c ORDER BY w DESC, s)
           |      AS rc
           |    FROM $in)
           |  WHERE rs = 1 AND rc = 1
           |), $out AS (
           |  SELECT e.* FROM $in e
           |  WHERE e.s NOT IN (SELECT s FROM m$rnd)
           |    AND e.c NOT IN (SELECT c FROM m$rnd)
           |)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT l_suppkey AS s, o_custkey AS c,
         |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
         |      * CAST(CAST(1 AS DECIMAL(4,3))
         |        - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(6,3))
         |      AS DECIMAL(28,5))) AS DECIMAL(38,5)) AS w
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2
         |), ${round("e0", "e1", 1)}, ${round("e1", "e2", 2)},
         |${round("e2", "e3", 3)}
         |SELECT s, c, CAST(w AS DOUBLE) AS weight, matched_round
         |FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2
         |  UNION ALL SELECT * FROM m3)
         |ORDER BY s""".stripMargin
    },

    // q314: per-arm cumulative ranks on the distinct-cents grain.
    "q314_quantile_effects" ->
      """WITH vals AS (
        |  SELECT CAST((CAST(md5_number_upper('qte#'
        |      || CAST(o_custkey AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 2 AS INT) AS arm,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders
        |), byval AS (
        |  SELECT arm, cents, COUNT(*) AS cv FROM vals GROUP BY 1, 2
        |), cum AS (
        |  SELECT arm, cents,
        |    SUM(cv) OVER (PARTITION BY arm ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM byval
        |), ns AS (
        |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n FROM vals GROUP BY 1
        |), dec AS (
        |  SELECT c.arm, d.d, CAST(MIN(c.cents) AS BIGINT) AS q
        |  FROM cum c JOIN ns ON ns.arm = c.arm
        |  CROSS JOIN (SELECT unnest(range(1, 10)) AS d) d
        |  WHERE c.cum >= (ns.n * d.d + 9) // 10
        |  GROUP BY 1, 2
        |)
        |SELECT t.d AS decile, t.q AS q_treat, u.q AS q_control,
        |  t.q - u.q AS qte_cents
        |FROM dec t JOIN dec u ON u.d = t.d AND u.arm = 0
        |WHERE t.arm = 1
        |ORDER BY decile""".stripMargin,

    // q315: the Φ⁻¹ thresholds come from the SAME driver-side Acklam
    // evaluation the Spark side uses, as a VALUES table.
    "q315_bh_fdr" -> {
      val rows = graft.queries.EvalQueries.bhThresholds.toSeq.sortBy(_._1)
        .map { case ((m, i), t) => s"($m, $i, $t)" }.mkString(",\n    ")
      s"""WITH urgent AS (
         |  SELECT DISTINCT o_custkey AS c_custkey FROM orders
         |  WHERE o_orderpriority = '1-URGENT'
         |), base AS (
         |  SELECT c.c_custkey, c.c_nationkey AS nation,
         |    CAST((CAST(md5_number_upper('aa#'
         |      || CAST(c.c_custkey AS VARCHAR)) AS HUGEINT)
         |      % 2305843009213693951) % 2 AS INT) AS arm,
         |    CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
         |  FROM customer c LEFT JOIN urgent u ON u.c_custkey = c.c_custkey
         |), tests AS (
         |  SELECT nation,
         |    CAST(SUM(arm) AS BIGINT) AS n1,
         |    CAST(SUM(1 - arm) AS BIGINT) AS n0,
         |    CAST(SUM(y * arm) AS BIGINT) AS y1,
         |    CAST(SUM(y * (1 - arm)) AS BIGINT) AS y0
         |  FROM base GROUP BY 1
         |  HAVING SUM(arm) > 0 AND SUM(1 - arm) > 0
         |    AND SUM(y) > 0 AND SUM(y) < COUNT(*)
         |), zed AS (
         |  SELECT *,
         |    (CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         |      - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         |    / sqrt((CAST(y1 + y0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
         |      * (1.0 - CAST(y1 + y0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
         |      * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n0 AS DOUBLE)))
         |      AS z
         |  FROM tests
         |), ranked AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY abs(z) DESC, nation)
         |    AS BIGINT) AS rank FROM zed
         |), mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ranked),
         |thr(m, rank, thr) AS (
         |  SELECT * FROM (VALUES
         |    $rows) AS t(m, rank, thr)
         |), flagged AS (
         |  SELECT r.*, t.thr, abs(r.z) >= t.thr AS flag
         |  FROM ranked r CROSS JOIN mm
         |  JOIN thr t ON t.m = mm.m AND t.rank = r.rank
         |), ks AS (
         |  SELECT COALESCE(MAX(CASE WHEN flag THEN rank END), 0) AS kstar
         |  FROM flagged
         |)
         |SELECT nation, n1, n0, round(z, 6) AS z, rank,
         |  round(thr, 6) AS bh_threshold,
         |  rank <= (SELECT kstar FROM ks) AS rejected
         |FROM flagged ORDER BY rank""".stripMargin
    },

    // q316: per-pattern replace-count equals all-occurrences because no
    // pattern in the set has a proper border (documented at the query);
    // the oracle therefore never needs the automaton.
    "q316_blocklist_scan" -> {
      val ps = graft.queries.EvalQueries.blocklistPatterns
      val total = ps.map(p =>
        s"(len(text) - len(replace(text, '$p', ''))) // ${p.length}")
        .mkString("\n    + ")
      val hit = ps.map(p =>
        s"CASE WHEN strpos(text, '$p') > 0 THEN 1 ELSE 0 END")
        .mkString("\n    + ")
      s"""SELECT doc_id,
         |  CAST($total AS BIGINT) AS total_matches,
         |  CAST($hit AS BIGINT) AS patterns_hit
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // q317: exact integer moment sums; fixed-order double assembly.
    "q317_overdispersion" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2
        |), sums AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(c) AS BIGINT) AS s1,
        |    CAST(SUM(c * c) AS BIGINT) AS s2
        |  FROM daily GROUP BY 1
        |)
        |SELECT event_type, n_days, s1 AS n_events,
        |  round(CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |    AS mean_daily,
        |  round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |    * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(n_days AS DOUBLE) - 1.0), 6) AS var_daily,
        |  round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |    * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(n_days AS DOUBLE) - 1.0))
        |    / (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
        |    AS dispersion_index,
        |  round((CAST(n_days AS DOUBLE) - 1.0)
        |    * ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |    * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(n_days AS DOUBLE) - 1.0))
        |    / (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
        |    AS chi2_stat
        |FROM sums ORDER BY event_type""".stripMargin,

    // q318: the same disjoint md5 document samples, replayed.
    "q318_capture_recapture" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |    CAST((CAST(md5_number_upper('cap#'
        |      || CAST(doc_id AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 10 AS BIGINT) AS draw
        |  FROM documents
        |), a AS (SELECT DISTINCT tok FROM toks WHERE draw < 5),
        |b AS (SELECT DISTINCT tok FROM toks WHERE draw >= 5),
        |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a FROM a),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b FROM b),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m_both
        |  FROM a JOIN b USING (tok)
        |), tr AS (
        |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_true FROM toks
        |)
        |SELECT n_a, n_b, m_both, n_true,
        |  round(CAST(n_a + 1 AS DOUBLE) * CAST(n_b + 1 AS DOUBLE)
        |    / CAST(m_both + 1 AS DOUBLE) - 1.0, 6) AS chapman_estimate
        |FROM na CROSS JOIN nb CROSS JOIN m CROSS JOIN tr""".stripMargin,

    // q319: q318's md5 split convention, Good-Turing on trigram types
    // (with repeats) from the train half.
    "q319_good_turing" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS a,
        |    CAST((CAST(md5_number_upper('gt#'
        |      || CAST(doc_id AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 10 AS BIGINT) AS draw
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), toks AS (
        |  SELECT doc_id, draw,
        |    a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS tok
        |  FROM docs, unnest(range(1, len(a) - 1)) AS u(i)
        |), counts AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM toks WHERE draw < 5 GROUP BY 1
        |), fof AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n_train,
        |    CAST(COUNT(*) AS BIGINT) AS v_train,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM counts
        |), held AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_heldout,
        |    CAST(SUM(CASE WHEN counts.tok IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_unseen_occ
        |  FROM (SELECT tok FROM toks WHERE draw >= 5) h
        |  LEFT JOIN counts ON h.tok = counts.tok
        |)
        |SELECT n_train, v_train, n1, n2, n_heldout, n_unseen_occ,
        |  round(CAST(n1 AS DOUBLE) / CAST(n_train AS DOUBLE), 6)
        |    AS p0_good_turing,
        |  round(CAST(n_unseen_occ AS DOUBLE) / CAST(n_heldout AS DOUBLE), 6)
        |    AS heldout_unseen_rate,
        |  round(2.0 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS r1_star
        |FROM fof CROSS JOIN held""".stripMargin,

    // q320: the DTW recurrence unrolled as 144 exact BIGINT cells —
    // layer CTE r_i holds DP row i; within a row DuckDB's lateral
    // column aliases express the left-to-right dependency.
    "q320_dtw_nations" -> {
      val n = 12
      val vs = (1 to n)
      val serCols = vs.map(m =>
        s"CAST(COALESCE(MAX(CASE WHEN m = $m THEN c END), 0) AS BIGINT) AS v$m")
        .mkString(",\n    ")
      val abCols = (vs.map(i => s"x.v$i AS a$i") ++
        vs.map(j => s"y.v$j AS b$j")).mkString(", ")
      val l1 = vs.map(i => s"abs(x.v$i - y.v$i)").mkString(" + ")
      val r1 = vs.map { j =>
        if (j == 1) s"abs(a1 - b1) AS d1_1"
        else s"d1_${j - 1} + abs(a1 - b$j) AS d1_$j"
      }.mkString(",\n    ")
      val layers = (2 to n).map { i =>
        val cells = vs.map { j =>
          if (j == 1) s"d${i - 1}_1 + abs(a$i - b1) AS d${i}_1"
          else s"abs(a$i - b$j) + least(d${i - 1}_$j, d${i - 1}_${j - 1}, " +
            s"d${i}_${j - 1}) AS d${i}_$j"
        }.mkString(",\n    ")
        s"r$i AS (\n  SELECT *,\n    $cells\n  FROM r${i - 1}\n)"
      }.mkString(", ")
      s"""WITH mc AS (
         |  SELECT c_nationkey AS nk, CAST(month(o_orderdate) AS INT) AS m,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate < TIMESTAMP '1996-01-01'
         |  GROUP BY 1, 2
         |), ser AS (
         |  SELECT n_nationkey AS nk, n_name AS name,
         |    $serCols
         |  FROM nation LEFT JOIN mc ON n_nationkey = mc.nk
         |  GROUP BY 1, 2
         |), pairs AS (
         |  SELECT x.name AS name_a, y.name AS name_b, $abCols,
         |    CAST($l1 AS BIGINT) AS l1
         |  FROM ser x JOIN ser y ON x.nk < y.nk
         |), r1 AS (
         |  SELECT *,
         |    $r1
         |  FROM pairs
         |), $layers
         |SELECT name_a, name_b, CAST(d12_12 AS BIGINT) AS dtw, l1,
         |  round(CASE WHEN l1 > 0
         |    THEN 1.0 - CAST(d12_12 AS DOUBLE) / CAST(l1 AS DOUBLE)
         |    ELSE 0.0 END, 6) AS warp_gain
         |FROM r12 ORDER BY name_a, name_b""".stripMargin
    },

    // q321: per-column window-run + value-grain profile, same round-9 →
    // DECIMAL term fold as the Spark side.
    "q321_encoding_advisor" -> {
      val per = graft.queries.EvalQueries.encodingColumns.map { case (l, c) =>
        s"""SELECT '$l' AS column_name, n, n_distinct, n_runs,
           |  round(CAST(n AS DOUBLE) / CAST(n_runs AS DOUBLE), 6)
           |    AS avg_run_len,
           |  round((ln(CAST(n AS DOUBLE))
           |    - CAST(clogc AS DOUBLE) / CAST(n AS DOUBLE)) / ln(2.0), 6)
           |    AS entropy_bits,
           |  CASE WHEN n_distinct * 100 <= n AND n >= n_runs * 2
           |      THEN 'dict_rle'
           |    WHEN n_distinct * 100 <= n THEN 'dict'
           |    WHEN n >= n_runs * 2 THEN 'rle'
           |    ELSE 'plain' END AS encoding
           |FROM (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN pv IS NULL OR pv <> v THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_runs
           |  FROM (
           |    SELECT $c AS v, lag($c) OVER (
           |      PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey,
           |        l_suppkey, l_quantity, l_extendedprice, l_discount,
           |        l_tax, l_returnflag, l_linestatus, l_shipdate) AS pv
           |    FROM lineitem)
           |) CROSS JOIN (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
           |    SUM(CAST(round(CAST(cnt AS DOUBLE)
           |      * ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(27,12))) AS clogc
           |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
           |    FROM lineitem GROUP BY $c)
           |)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT * FROM (
         |$per
         |) ORDER BY column_name""".stripMargin
    },

    // q322: integer nano-nat scores make the argmax exact; the window
    // rank replays Spark's min(struct(-score, cand)) tiebreak.
    "q322_naive_bayes" ->
      """WITH feats AS (
        |  SELECT doc_id, lang,
        |    CAST((CAST(md5_number_upper('nb#'
        |      || CAST(doc_id AS VARCHAR)) AS HUGEINT)
        |      % 2305843009213693951) % 10 AS BIGINT) AS draw,
        |    unnest(string_split(text, ' ')
        |      || ['LEN#' || CAST(least(n_chars // 50, 11) AS VARCHAR)])
        |      AS feat
        |  FROM documents
        |), train AS (SELECT * FROM feats WHERE draw < 7),
        |test AS (SELECT * FROM feats WHERE draw >= 7),
        |lang_stats AS (
        |  SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_occ
        |  FROM train GROUP BY 1
        |), vocab AS (SELECT DISTINCT feat FROM train),
        |vn AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        |counts AS (
        |  SELECT lang, feat, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM train GROUP BY 1, 2
        |), model AS (
        |  SELECT ls.lang, vb.feat,
        |    CAST(round(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
        |      / CAST(ls.n_occ + vn.v AS DOUBLE)) * 1e9) AS BIGINT) AS lnp
        |  FROM lang_stats ls CROSS JOIN vn CROSS JOIN vocab vb
        |  LEFT JOIN counts c ON c.lang = ls.lang AND c.feat = vb.feat
        |), ntd AS (
        |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_train_docs
        |  FROM train
        |), lang_side AS (
        |  SELECT ls.lang AS cand,
        |    CAST(round(ln(CAST(ls.n_docs AS DOUBLE)
        |      / CAST(ntd.n_train_docs AS DOUBLE)) * 1e9) AS BIGINT)
        |      AS prior_n,
        |    CAST(round(ln(1.0 / CAST(ls.n_occ + vn.v AS DOUBLE)) * 1e9)
        |      AS BIGINT) AS lnp0,
        |    ls.n_docs
        |  FROM lang_stats ls CROSS JOIN vn CROSS JOIN ntd
        |), test_feats AS (
        |  SELECT doc_id, lang, feat, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM test GROUP BY 1, 2, 3
        |), part AS (
        |  SELECT tf.doc_id, m.lang AS cand,
        |    CAST(SUM(tf.k * m.lnp) AS BIGINT) AS p_seen
        |  FROM test_feats tf JOIN model m ON tf.feat = m.feat
        |  GROUP BY 1, 2
        |), unseen AS (
        |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS k_unseen
        |  FROM test_feats tf
        |  WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE v.feat = tf.feat)
        |  GROUP BY 1
        |), scored AS (
        |  SELECT d.doc_id, d.lang AS lang_true, ls.cand,
        |    ls.prior_n + COALESCE(p.p_seen, 0)
        |      + COALESCE(u.k_unseen, 0) * ls.lnp0 AS score
        |  FROM (SELECT DISTINCT doc_id, lang FROM test) d
        |  CROSS JOIN lang_side ls
        |  LEFT JOIN part p ON p.doc_id = d.doc_id AND p.cand = ls.cand
        |  LEFT JOIN unseen u ON u.doc_id = d.doc_id
        |), pred AS (
        |  SELECT doc_id, lang_true, cand AS lang_pred FROM (
        |    SELECT doc_id, lang_true, cand, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
        |    FROM scored) WHERE rn = 1
        |), confusion AS (
        |  SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM pred GROUP BY 1, 2
        |), acc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
        |    CAST(SUM(CASE WHEN lang_true = lang_pred THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_correct
        |  FROM pred
        |), maj AS (
        |  SELECT cand AS maj_lang FROM lang_side
        |  ORDER BY n_docs DESC, cand ASC LIMIT 1
        |), majacc AS (
        |  SELECT CAST(SUM(CASE WHEN p.lang_true = m.maj_lang
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_maj
        |  FROM pred p CROSS JOIN maj m
        |)
        |SELECT lang_true, lang_pred, n,
        |  round(CAST(n_correct AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
        |    AS accuracy,
        |  round(CAST(n_maj AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
        |    AS majority_baseline
        |FROM confusion CROSS JOIN acc CROSS JOIN majacc
        |ORDER BY lang_true, lang_pred""".stripMargin,

    // q323: one-pass fold moments; train = total − fold; closed-form
    // ridge per (fold, λ); SSEs quantize round-6 → DECIMAL.
    "q323_ridge_cv" -> {
      val lams = graft.queries.EvalQueries.ridgeLambdas.mkString(", ")
      s"""WITH li AS (
         |  SELECT CAST(CAST(round(l_quantity) AS BIGINT) AS DECIMAL(11,0))
         |      AS x,
         |    CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
         |      AS DECIMAL(13,0)) AS y,
         |    CAST((CAST(md5_number_upper(CAST(l_orderkey AS VARCHAR) || ':'
         |      || CAST(l_linenumber AS VARCHAR) || ':'
         |      || CAST(l_partkey AS VARCHAR) || ':'
         |      || CAST(l_suppkey AS VARCHAR)) AS HUGEINT)
         |      % 2305843009213693951) % 5 AS BIGINT) AS fold
         |  FROM lineitem
         |), folds AS (
         |  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(CAST(x AS DECIMAL(19,0)) * x) AS sxx,
         |    SUM(CAST(x AS DECIMAL(19,0)) * y) AS sxy,
         |    SUM(CAST(y AS DECIMAL(19,0)) * y) AS syy
         |  FROM li GROUP BY 1
         |), tot AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS tn, SUM(sx) AS tsx,
         |    SUM(sy) AS tsy, SUM(sxx) AS tsxx, SUM(sxy) AS tsxy,
         |    SUM(syy) AS tsyy
         |  FROM folds
         |), ev AS (
         |  SELECT fold, lambda, n, sx, sy, sxx, sxy, syy, tn,
         |    CAST(tn - n AS DOUBLE) AS rn, CAST(tsx - sx AS DOUBLE) AS rsx,
         |    CAST(tsy - sy AS DOUBLE) AS rsy,
         |    CAST(tsxx - sxx AS DOUBLE) AS rsxx,
         |    CAST(tsxy - sxy AS DOUBLE) AS rsxy
         |  FROM folds CROSS JOIN tot
         |  CROSS JOIN (SELECT unnest([$lams]) AS lambda)
         |), ev2 AS (
         |  SELECT fold, lambda, n, sx, sy, sxx, sxy, syy, tn, rsy, rsx, rn,
         |    (rsxy - rsx * rsy / rn)
         |      / (rsxx - rsx * rsx / rn + CAST(lambda AS DOUBLE)) AS b
         |  FROM ev
         |), ev3 AS (
         |  SELECT fold, lambda, n, sx, sy, sxx, sxy, syy, tn, b,
         |    (rsy - b * rsx) / rn AS a
         |  FROM ev2
         |), sse AS (
         |  SELECT lambda,
         |    SUM(CAST(round((CAST(syy AS DOUBLE)
         |      + CAST(n AS DOUBLE) * a * a + b * b * CAST(sxx AS DOUBLE)
         |      - 2.0 * a * CAST(sy AS DOUBLE)
         |      - 2.0 * b * CAST(sxy AS DOUBLE)
         |      + 2.0 * a * b * CAST(sx AS DOUBLE))
         |      / (10000.0 * CAST(tn AS DOUBLE)), 6) AS DECIMAL(38,6)))
         |      AS cv_mse
         |  FROM ev3 GROUP BY 1
         |), chosen AS (
         |  SELECT lambda AS chosen_lambda FROM sse
         |  ORDER BY cv_mse ASC, lambda ASC LIMIT 1
         |), fin1 AS (
         |  SELECT chosen_lambda,
         |    (CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE)
         |      * CAST(tsy AS DOUBLE) / CAST(tn AS DOUBLE))
         |    / (CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE)
         |      * CAST(tsx AS DOUBLE) / CAST(tn AS DOUBLE)
         |      + CAST(chosen_lambda AS DOUBLE)) AS fb,
         |    tsy, tsx, tn
         |  FROM tot CROSS JOIN chosen
         |), fin AS (
         |  SELECT chosen_lambda, fb,
         |    (CAST(tsy AS DOUBLE) - fb * CAST(tsx AS DOUBLE))
         |      / CAST(tn AS DOUBLE) AS fa
         |  FROM fin1
         |)
         |SELECT lambda, round(CAST(cv_mse AS DOUBLE), 2) AS cv_mse_usd2,
         |  lambda = chosen_lambda AS chosen,
         |  round(fa / 100.0, 6) AS final_intercept,
         |  round(fb / 100.0, 6) AS final_slope_per_unit_qty
         |FROM sse CROSS JOIN fin
         |ORDER BY lambda""".stripMargin
    },

    // q324: three unrolled EM iterations; responsibilities round-9,
    // weighted moment terms round-6/round-3 → DECIMAL folds.
    "q324_gaussian_em" -> {
      def estep(k: Int): String = {
        val p = s"p${k - 1}"
        def phi(mu: String, s: String) =
          s"(exp((bk.v - $p.$mu)*(bk.v - $p.$mu) / (-2.0 * $p.$s * $p.$s)) / $p.$s)"
        s"""e$k AS (
           |  SELECT bk.v, bk.c, $p.n,
           |    round($p.pi1 * ${phi("mu1", "s1")}
           |      / ($p.pi1 * ${phi("mu1", "s1")}
           |        + (1.0 - $p.pi1) * ${phi("mu2", "s2")}), 9) AS r
           |  FROM bk CROSS JOIN $p
           |), m$k AS (
           |  SELECT MAX(n) AS n,
           |    SUM(CAST(round(c * r, 6) AS DECIMAL(38,6))) AS w1,
           |    SUM(CAST(round(c * r * v, 6) AS DECIMAL(38,6))) AS wx1,
           |    SUM(CAST(round(c * r * v * v, 3) AS DECIMAL(38,3))) AS wxx1,
           |    SUM(CAST(round(c * (1.0 - r), 6) AS DECIMAL(38,6))) AS w2,
           |    SUM(CAST(round(c * (1.0 - r) * v, 6) AS DECIMAL(38,6)))
           |      AS wx2,
           |    SUM(CAST(round(c * (1.0 - r) * v * v, 3) AS DECIMAL(38,3)))
           |      AS wxx2
           |  FROM e$k
           |), p$k AS (
           |  SELECT n,
           |    CAST(w1 AS DOUBLE) / (CAST(w1 AS DOUBLE)
           |      + CAST(w2 AS DOUBLE)) AS pi1,
           |    CAST(wx1 AS DOUBLE) / CAST(w1 AS DOUBLE) AS mu1,
           |    sqrt(CAST(wxx1 AS DOUBLE) / CAST(w1 AS DOUBLE)
           |      - (CAST(wx1 AS DOUBLE) / CAST(w1 AS DOUBLE))
           |      * (CAST(wx1 AS DOUBLE) / CAST(w1 AS DOUBLE))) AS s1,
           |    CAST(wx2 AS DOUBLE) / CAST(w2 AS DOUBLE) AS mu2,
           |    sqrt(CAST(wxx2 AS DOUBLE) / CAST(w2 AS DOUBLE)
           |      - (CAST(wx2 AS DOUBLE) / CAST(w2 AS DOUBLE))
           |      * (CAST(wx2 AS DOUBLE) / CAST(w2 AS DOUBLE))) AS s2
           |  FROM m$k
           |)""".stripMargin
      }
      s"""WITH b AS (
         |  SELECT CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) * 1000 + 500
         |      AS vi,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM orders GROUP BY 1
         |), bk AS (SELECT CAST(vi AS DOUBLE) AS v, c FROM b),
         |m0 AS (
         |  SELECT CAST(SUM(c) AS BIGINT) AS n,
         |    SUM(CAST(round(c * v, 6) AS DECIMAL(38,6))) AS sv,
         |    SUM(CAST(round(c * v * v, 3) AS DECIMAL(38,3))) AS svv
         |  FROM bk
         |), st AS (
         |  SELECT n, CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |    sqrt(CAST(svv AS DOUBLE) / CAST(n AS DOUBLE)
         |      - (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
         |  FROM m0
         |), p0 AS (
         |  SELECT n, 0.5 AS pi1, mean - sd AS mu1, sd AS s1,
         |    mean + sd AS mu2, sd AS s2
         |  FROM st
         |), ${estep(1)}, ${estep(2)}, ${estep(3)}
         |SELECT n AS n_orders, round(pi1, 6) AS pi1,
         |  round(mu1, 4) AS mu1, round(s1, 4) AS sigma1,
         |  round(mu2, 4) AS mu2, round(s2, 4) AS sigma2
         |FROM p3""".stripMargin
    },

    // q325: the identical Holt recurrence as a recursive CTE over the
    // month index; fitted_t = level+trend of the state at t−1.
    "q325_holt_smoothing" ->
      """WITH RECURSIVE m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), idx AS (
        |  SELECT ym, y,
        |    CAST(row_number() OVER (ORDER BY ym) AS BIGINT) AS rn
        |  FROM m
        |), nmax AS (SELECT CAST(MAX(rn) AS BIGINT) AS t_max FROM idx),
        |rec AS (
        |  SELECT CAST(1 AS BIGINT) AS t,
        |    CAST(i1.y AS DOUBLE) AS s,
        |    CAST(i2.y AS DOUBLE) - CAST(i1.y AS DOUBLE) AS b
        |  FROM idx i1 JOIN idx i2 ON i1.rn = 1 AND i2.rn = 2
        |  UNION ALL
        |  SELECT r.t + 1,
        |    0.3 * CAST(i.y AS DOUBLE) + 0.7 * (r.s + r.b),
        |    0.1 * ((0.3 * CAST(i.y AS DOUBLE) + 0.7 * (r.s + r.b)) - r.s)
        |      + 0.9 * r.b
        |  FROM rec r JOIN idx i ON i.rn = r.t + 1
        |)
        |SELECT * FROM (
        |  SELECT 'fit' AS kind, i.ym, i.y,
        |    CASE WHEN i.rn = 1 THEN NULL
        |      ELSE round(r.s + r.b, 6) END AS fitted
        |  FROM idx i LEFT JOIN rec r ON r.t = i.rn - 1
        |  UNION ALL
        |  SELECT 'forecast', 'h' || CAST(h AS VARCHAR),
        |    CAST(NULL AS BIGINT),
        |    round(r.s + CAST(h AS DOUBLE) * r.b, 6)
        |  FROM rec r CROSS JOIN nmax
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS h)
        |  WHERE r.t = nmax.t_max
        |) ORDER BY kind, ym""".stripMargin,

    // q326: one-pass exact cents moments; dollar-scale σ; Σ-terms
    // quantized at 4/0 decimals where the grid dominates the ulp.
    "q326_neyman_allocation" ->
      """WITH s AS (
        |  SELECT o_orderpriority AS stratum,
        |    CAST(COUNT(*) AS BIGINT) AS n_h,
        |    SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS DECIMAL(28,0))) AS sv,
        |    SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS DECIMAL(19,0))) AS svv
        |  FROM orders GROUP BY 1
        |), sd AS (
        |  SELECT stratum, n_h,
        |    sqrt((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)
        |      * CAST(sv AS DOUBLE) / CAST(n_h AS DOUBLE))
        |      / CAST(n_h AS DOUBLE)) / 100.0 AS sd_usd
        |  FROM s
        |), tot AS (
        |  SELECT CAST(SUM(n_h) AS BIGINT) AS n_tot,
        |    SUM(CAST(round(CAST(n_h AS DOUBLE) * sd_usd, 4)
        |      AS DECIMAL(38,4))) AS sns,
        |    SUM(CAST(round(CAST(n_h AS DOUBLE) * sd_usd * sd_usd, 0)
        |      AS DECIMAL(38,0))) AS sns2
        |  FROM sd
        |)
        |SELECT stratum, n_h, round(sd_usd, 4) AS sd_usd,
        |  CAST(round(10000.0 * CAST(n_h AS DOUBLE) * sd_usd
        |    / CAST(sns AS DOUBLE), 0) AS BIGINT) AS n_neyman,
        |  CAST(round(10000.0 * CAST(n_h AS DOUBLE)
        |    / CAST(n_tot AS DOUBLE), 0) AS BIGINT) AS n_prop,
        |  round((CAST(sns AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |    * (CAST(sns AS DOUBLE) / CAST(n_tot AS DOUBLE))
        |    / (CAST(sns2 AS DOUBLE) / CAST(n_tot AS DOUBLE)), 6)
        |    AS neyman_vs_prop_var_ratio
        |FROM sd CROSS JOIN tot
        |ORDER BY stratum""".stripMargin,

    // q327: the z constant is the driver-evaluated Acklam value shared
    // verbatim with the Spark side.
    "q327_ab_power" -> {
      val z = graft.queries.EvalQueries.invNorm(0.975) +
        graft.queries.EvalQueries.invNorm(0.8)
      s"""WITH base AS (
         |  SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_conv
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1
         |), p AS (
         |  SELECT nation, n_orders, n_conv,
         |    CAST(n_conv AS DOUBLE) / CAST(n_orders AS DOUBLE) AS p
         |  FROM base
         |), m AS (
         |  SELECT nation, n_orders, n_conv, p,
         |    $z * sqrt(2.0 * p * (1.0 - p)
         |      / (CAST(n_orders AS DOUBLE) / 2.0)) AS mde_abs
         |  FROM p
         |)
         |SELECT nation, n_orders, n_conv, round(p, 6) AS p_base,
         |  round(mde_abs, 6) AS mde_abs,
         |  round(mde_abs / p, 6) AS mde_rel,
         |  mde_abs / p <= 0.05 AS powered_5pct_lift,
         |  CAST(round(${z * z} * 2.0 * p * (1.0 - p)
         |    / ((0.05 * p) * (0.05 * p)), 0) AS BIGINT)
         |    AS n_req_per_arm_5pct
         |FROM m ORDER BY nation""".stripMargin
    },

    // q328: matrix-free power iteration, 4 unrolled passes; coordinate
    // sums quantize round-9 → DECIMAL; list_dot_product bit-matches the
    // Spark DotProduct fold (the q30 convention).
    "q328_pca_power" -> {
      def iter(k: Int): String =
        s"""s$k AS (
           |  SELECT cx.vec_id, cx.cx,
           |    list_dot_product(cx.cx, vv.vec) AS s
           |  FROM cx CROSS JOIN v${k - 1} vv
           |), wc$k AS (
           |  SELECT i, CAST(SUM(CAST(round(s * cxi, 9) AS DECIMAL(27,12)))
           |    AS DOUBLE) AS w
           |  FROM (SELECT s, unnest(cx) AS cxi,
           |      unnest(range(1, 1 + len(cx))) AS i FROM s$k)
           |  GROUP BY i
           |), v$k AS (
           |  SELECT list(w / nrm ORDER BY i) AS vec
           |  FROM wc$k CROSS JOIN (
           |    SELECT sqrt(CAST(SUM(CAST(round(w * w, 9)
           |      AS DECIMAL(27,12))) AS DOUBLE)) AS nrm FROM wc$k)
           |)""".stripMargin
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
         |coord AS (
         |  SELECT vec_id, unnest(v) AS x,
         |    unnest(range(1, 1 + len(v))) AS i
         |  FROM e
         |), mu AS (
         |  SELECT i, CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
         |    / (SELECT CAST(n AS DOUBLE) FROM nn) AS m
         |  FROM coord GROUP BY i
         |), cx AS (
         |  SELECT vec_id, list(x - m ORDER BY i) AS cx
         |  FROM coord JOIN mu USING (i) GROUP BY vec_id
         |), v0 AS (SELECT list_transform(range(1, 65), i -> 0.125) AS vec),
         |${iter(1)}, ${iter(2)}, ${iter(3)}, ${iter(4)},
         |proj AS (
         |  SELECT SUM(CAST(round(s * s, 9) AS DECIMAL(27,12))) AS ss
         |  FROM (SELECT list_dot_product(cx.cx, vv.vec) AS s
         |    FROM cx CROSS JOIN v4 vv)
         |), tr AS (
         |  SELECT SUM(CAST(round(list_dot_product(cx, cx), 9)
         |    AS DECIMAL(27,12))) AS tr
         |  FROM cx
         |)
         |SELECT CAST(comp AS BIGINT) AS component, round(lv, 6) AS loading,
         |  n AS n_vecs,
         |  round(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE), 6)
         |    AS top_eigenvalue,
         |  round(CAST(ss AS DOUBLE) / CAST(tr AS DOUBLE), 6)
         |    AS variance_share
         |FROM (SELECT unnest(vec) AS lv, unnest(range(1, 65)) AS comp
         |  FROM v4) lv
         |CROSS JOIN nn CROSS JOIN proj CROSS JOIN tr
         |WHERE comp <= 8 ORDER BY component""".stripMargin
    },

    // q329: four unrolled min-plus relaxation layers from supplier 1.
    "q329_sssp_latency" -> {
      def relax(k: Int): String =
        s"""d$k AS (
           |  SELECT node, MIN(d) AS d FROM (
           |    SELECT node, d FROM d${k - 1}
           |    UNION ALL
           |    SELECT e.v AS node, dd.d + e.w AS d
           |    FROM edges e JOIN d${k - 1} dd ON e.u = dd.node
           |  ) GROUP BY node
           |)""".stripMargin
      s"""WITH ed AS (
         |  SELECT l_suppkey AS sk, o_custkey AS ck,
         |    CAST(MIN(abs(datediff('day', o_orderdate, l_shipdate))) + 1
         |      AS BIGINT) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2
         |), edges AS (
         |  SELECT sk * 2 AS u, ck * 2 + 1 AS v, w FROM ed
         |  UNION ALL
         |  SELECT ck * 2 + 1, sk * 2, w FROM ed
         |), d0 AS (SELECT CAST(2 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d),
         |${relax(1)}, ${relax(2)}, ${relax(3)}, ${relax(4)}
         |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
         |    AS side,
         |  CAST(COUNT(*) AS BIGINT) AS n_reached,
         |  MIN(d) AS min_days, MAX(d) AS max_days,
         |  CAST(SUM(d) AS BIGINT) AS sum_days
         |FROM d4 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q330: frames are byte-aligned 16-char slices (ascii corpus, so
    // char slicing equals the Spark binary slicing); same cap, same
    // containment, same top-10 order.
    "q330_frame_dedup" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |), fr AS (
        |  SELECT DISTINCT media_id,
        |    md5(substring(text, i * 16 + 1, 16)) AS fh
        |  FROM media, unnest(range(0,
        |    greatest(CAST(floor(len(text) / 16.0) AS INT) - 1, 0) + 1))
        |    u(i)
        |), nf AS (
        |  SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames
        |  FROM fr GROUP BY 1
        |), capped AS (
        |  SELECT fr.media_id, fr.fh FROM fr
        |  JOIN (SELECT fh FROM fr GROUP BY fh HAVING COUNT(*) <= 100) ok
        |    ON fr.fh = ok.fh
        |), pr AS (
        |  SELECT a.media_id AS id_a, b.media_id AS id_b,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM capped a JOIN capped b
        |    ON a.fh = b.fh AND a.media_id < b.media_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b, shared, na.n_frames AS n_a,
        |    nb.n_frames AS n_b,
        |    round(CAST(shared AS DOUBLE)
        |      / CAST(least(na.n_frames, nb.n_frames) AS DOUBLE), 6)
        |      AS containment
        |  FROM pr
        |  JOIN nf na ON na.media_id = id_a
        |  JOIN nf nb ON nb.media_id = id_b
        |  WHERE round(CAST(shared AS DOUBLE)
        |    / CAST(least(na.n_frames, nb.n_frames) AS DOUBLE), 6) >= 0.5
        |), summary AS (
        |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs)
        |      AS n_neardup_pairs,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM media) AS n_media
        |)
        |SELECT id_a, id_b, shared, n_a, n_b, containment,
        |  n_neardup_pairs, n_media
        |FROM pairs CROSS JOIN summary
        |ORDER BY containment DESC, id_a, id_b LIMIT 10""".stripMargin,

    // q331: the identical DP as DuckDB list lambdas — prefix sums are
    // integer-valued doubles (exact regardless of summation path),
    // list_min is order-independent, list_position ties break at the
    // first occurrence in both engines.
    "q331_voptimal_histogram" -> {
      val b = 8
      def sse(j: String, i: String): String = {
        def d(arr: String, k: String) =
          s"(CASE WHEN $k = 0 THEN 0.0 ELSE $arr[$k] END)"
        s"((${d("F2", i)} - ${d("F2", j)}) - " +
          s"(${d("F1", i)} - ${d("F1", j)}) * " +
          s"(${d("F1", i)} - ${d("F1", j)}) / CAST($i - $j AS DOUBLE))"
      }
      val layers = (2 to b).map { k =>
        val cand = s"list_transform(range($k - 1, i), " +
          s"j -> e${k - 1}[j] + ${sse("j", "i")})"
        s"""l$k AS (
           |  SELECT *,
           |    list_transform(range(1, n + 1), i -> CASE WHEN i < $k
           |      THEN NULL ELSE list_min($cand) END) AS e$k,
           |    list_transform(range(1, n + 1), i -> CASE WHEN i < $k
           |      THEN NULL ELSE CAST($k - 2
           |        + list_position($cand, list_min($cand)) AS INT) END)
           |      AS a$k
           |  FROM ${if (k == 2) "l1e" else s"l${k - 1}"}
           |)""".stripMargin
      }.mkString(", ")
      val backtrack = (b to 2 by -1).map { k =>
        s"""t${k - 1} AS (SELECT *, a$k[i$k] AS i${k - 1} FROM t$k)"""
      }.mkString(", ")
      val segs = (1 to b).map { k =>
        val lo = if (k == 1) "0" else s"i${k - 1}"
        s"""SELECT CAST($k AS BIGINT) AS segment,
           |  vs[$lo + 1] AS v_start, vs[i$k] AS v_end,
           |  CAST(i$k - $lo AS BIGINT) AS n_values,
           |  round(((CASE WHEN i$k = 0 THEN 0.0 ELSE F1[i$k] END)
           |    - (CASE WHEN $lo = 0 THEN 0.0 ELSE F1[$lo] END))
           |    / CAST(i$k - $lo AS DOUBLE), 6) AS seg_avg_freq,
           |  round(${sse(lo, s"i$k")}, 6) AS seg_sse,
           |  round(e$b[n], 6) AS total_sse,
           |  round(e1[n], 6) AS flat_sse
           |FROM t1""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH g AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS v,
         |    CAST(COUNT(*) AS BIGINT) AS f
         |  FROM lineitem GROUP BY 1
         |), w AS (
         |  SELECT v, f,
         |    SUM(CAST(f AS DOUBLE)) OVER (ORDER BY v) AS f1v,
         |    SUM(CAST(f AS DOUBLE) * CAST(f AS DOUBLE)) OVER (ORDER BY v)
         |      AS f2v
         |  FROM g
         |), l1 AS (
         |  SELECT list(v ORDER BY v) AS vs,
         |    list(f1v ORDER BY v) AS F1, list(f2v ORDER BY v) AS F2,
         |    CAST(COUNT(*) AS INT) AS n
         |  FROM w
         |), l1e AS (
         |  SELECT *, list_transform(range(1, n + 1),
         |    i -> ${sse("0", "i")}) AS e1
         |  FROM l1
         |), $layers,
         |t$b AS (SELECT *, n AS i$b FROM l$b), $backtrack
         |SELECT * FROM (
         |$segs
         |) ORDER BY segment""".stripMargin
    },

    // q332: same md5 % (2^61−1) hash universe; k-min per side via
    // ORDER BY + LIMIT (the heap operator's semantics).
    "q332_kmv_setops" ->
      """WITH docs AS (
        |  SELECT source, string_split(text, ' ') AS a FROM documents
        |  WHERE source IN ('src0', 'src1')
        |    AND len(string_split(text, ' ')) >= 3
        |), grams AS (
        |  SELECT DISTINCT source,
        |    a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
        |  FROM docs, unnest(range(1, len(a) - 1)) AS u(i)
        |), hashed AS (
        |  SELECT source, CAST(CAST(md5_number_upper(g) AS HUGEINT)
        |    % 2305843009213693951 AS BIGINT) AS h
        |  FROM grams
        |), kmin AS (
        |  SELECT source, h FROM (
        |    SELECT source, h, row_number() OVER (
        |      PARTITION BY source ORDER BY h) AS rn
        |    FROM hashed) WHERE rn <= 64
        |), exact AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM hashed GROUP BY 1
        |), merged AS (
        |  SELECT DISTINCT h FROM kmin ORDER BY h LIMIT 64
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k_u, MAX(m.h) AS kth_u,
        |    CAST(SUM(CASE WHEN ka.h IS NOT NULL AND kb.h IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS k_both
        |  FROM merged m
        |  LEFT JOIN (SELECT h FROM kmin WHERE source = 'src0') ka
        |    ON m.h = ka.h
        |  LEFT JOIN (SELECT h FROM kmin WHERE source = 'src1') kb
        |    ON m.h = kb.h
        |), per_side AS (
        |  SELECT k.source, CAST(COUNT(*) AS BIGINT) AS k_eff,
        |    MAX(k.h) AS kth
        |  FROM kmin k GROUP BY 1
        |), inter AS (
        |  SELECT CAST(SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS inter_exact,
        |    CAST(COUNT(*) AS BIGINT) AS union_exact
        |  FROM (SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM hashed GROUP BY 1)
        |)
        |SELECT p.source, p.k_eff, e.n_exact,
        |  round(CAST(p.k_eff - 1 AS DOUBLE)
        |    / (CAST(p.kth AS DOUBLE) / 2305843009213693951.0), 2)
        |    AS n_est,
        |  i.union_exact,
        |  round(CAST(s.k_u - 1 AS DOUBLE)
        |    / (CAST(s.kth_u AS DOUBLE) / 2305843009213693951.0), 2)
        |    AS union_est,
        |  i.inter_exact,
        |  round(CAST(s.k_both AS DOUBLE) / CAST(s.k_u AS DOUBLE)
        |    * (CAST(s.k_u - 1 AS DOUBLE)
        |      / (CAST(s.kth_u AS DOUBLE) / 2305843009213693951.0)), 2)
        |    AS inter_est
        |FROM per_side p JOIN exact e ON p.source = e.source
        |CROSS JOIN stats s CROSS JOIN inter i
        |ORDER BY p.source""".stripMargin,

    // q333: the identical FFD fold as a per-source recursive CTE (all
    // integer arithmetic — no FP anywhere in the packing).
    "q333_ffd_compaction" ->
      """WITH RECURSIVE s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_files,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
        |    list(n_chars ORDER BY n_chars DESC) AS sizes
        |  FROM documents GROUP BY 1
        |), rec AS (
        |  SELECT source, n_files, total_bytes, sizes,
        |    CAST(0 AS BIGINT) AS idx, CAST([] AS BIGINT[]) AS bins
        |  FROM s
        |  UNION ALL
        |  SELECT source, n_files, total_bytes, sizes, idx + 1,
        |    CASE WHEN list_position(
        |        list_transform(bins, r -> r >= sizes[idx + 1]), true) > 0
        |      THEN list_transform(range(1, 1 + len(bins)),
        |        i -> CASE WHEN i = list_position(
        |            list_transform(bins, r -> r >= sizes[idx + 1]), true)
        |          THEN bins[i] - sizes[idx + 1] ELSE bins[i] END)
        |      ELSE list_append(bins, 4096 - sizes[idx + 1]) END
        |  FROM rec WHERE idx < len(sizes)
        |), done AS (
        |  SELECT source, n_files, total_bytes,
        |    CAST(len(bins) AS BIGINT) AS n_bins_ffd
        |  FROM rec WHERE idx = len(sizes)
        |)
        |SELECT source, n_files, total_bytes, n_bins_ffd,
        |  CAST(ceil(CAST(total_bytes AS DOUBLE) / 4096.0) AS BIGINT)
        |    AS lower_bound,
        |  round(1.0 - CAST(total_bytes AS DOUBLE)
        |    / (CAST(n_bins_ffd AS DOUBLE) * 4096.0), 6) AS waste_frac,
        |  n_bins_ffd = CAST(ceil(CAST(total_bytes AS DOUBLE) / 4096.0)
        |    AS BIGINT) AS is_optimal
        |FROM done ORDER BY source""".stripMargin,

    // q334: identical integer nano-unit rounds; HUGEINT `//` mirrors
    // Spark's DECIMAL(38,0) IntegralDivide on positive operands.
    "q334_pagerank" -> {
      def round(k: Int): String =
        s"""recv$k AS (
           |  SELECT e.v AS node, SUM(CAST(p.pr AS HUGEINT) * (17 * e.w)
           |      // CAST(20 * e.outw AS HUGEINT)) AS recv
           |  FROM edges e JOIN pr${k - 1} p ON e.u = p.node GROUP BY 1
           |), pr$k AS (
           |  SELECT n.node, CAST((SELECT base FROM consts)
           |    + COALESCE(r.recv, 0) AS BIGINT) AS pr
           |  FROM nodes n LEFT JOIN recv$k r ON n.node = r.node
           |)""".stripMargin
      s"""WITH ed AS (
         |  SELECT c.c_nationkey AS u, s.s_nationkey AS v,
         |    CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
         |        AS BIGINT)
         |      * (100 - CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100
         |        AS BIGINT))) AS BIGINT) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2
         |), edges AS (
         |  SELECT ed.u, ed.v, ed.w, ow.outw
         |  FROM ed JOIN (SELECT u, CAST(SUM(w) AS BIGINT) AS outw
         |    FROM ed GROUP BY 1) ow ON ed.u = ow.u
         |), nodes AS (
         |  SELECT DISTINCT u AS node FROM edges
         |  UNION SELECT DISTINCT v FROM edges
         |), consts AS (
         |  SELECT COUNT(*) AS n,
         |    (150000000 * 2 + COUNT(*)) // (2 * COUNT(*)) AS base,
         |    1000000000 // COUNT(*) AS init FROM nodes
         |), pr0 AS (
         |  SELECT node, CAST((SELECT init FROM consts) AS BIGINT) AS pr
         |  FROM nodes
         |), ${round(1)}, ${round(2)}, ${round(3)}
         |SELECT n.n_name, p.pr AS pr_nano,
         |  COALESCE((SELECT MAX(outw) FROM edges e WHERE e.u = p.node), 0)
         |    AS out_cc,
         |  COALESCE((SELECT CAST(SUM(w) AS BIGINT) FROM edges e
         |    WHERE e.v = p.node), 0) AS in_cc,
         |  CAST(row_number() OVER (ORDER BY p.pr DESC, p.node ASC)
         |    AS BIGINT) AS rank
         |FROM pr3 p JOIN nation n ON p.node = n.n_nationkey
         |ORDER BY rank""".stripMargin
    },

    // q335: identical register build — same hash universe, same
    // trailing-zero CASE chain (shared generator), BIGINT shifts, and
    // the same driver-interpolated α·m²·2^54 numerator.
    "q335_hll" -> {
      val m = 256
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val cNum = alpha * m * m * math.pow(2.0, 54)
      val rho = graft.queries.EvalQueries.sqlRho(s"(h // $m)")
      s"""WITH docs AS (
         |  SELECT lang, string_split(text, ' ') AS a FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3
         |), grams AS (
         |  SELECT DISTINCT lang,
         |    a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
         |  FROM docs, unnest(range(1, len(a) - 1)) AS u(i)
         |), hashed AS (
         |  SELECT lang, CAST(CAST(md5_number_upper(g) AS HUGEINT)
         |    % 2305843009213693951 AS BIGINT) AS h
         |  FROM grams
         |), regs AS (
         |  SELECT lang, h % $m AS bucket, MAX($rho) AS mj
         |  FROM hashed GROUP BY 1, 2
         |), lang_sketch AS (
         |  SELECT lang,
         |    CAST(SUM(CAST(1 AS BIGINT) << (54 - mj)) AS BIGINT)
         |      + ($m - COUNT(*)) * (CAST(1 AS BIGINT) << 54) AS s_scaled,
         |    CAST(COUNT(*) AS BIGINT) AS n_filled
         |  FROM regs GROUP BY 1
         |), lang_exact AS (
         |  SELECT lang, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact
         |  FROM hashed GROUP BY 1
         |), ghash AS (SELECT DISTINCT h FROM hashed
         |), gregs AS (
         |  SELECT h % $m AS bucket, MAX($rho) AS mj FROM ghash GROUP BY 1
         |), direct AS (
         |  SELECT
         |    CAST(SUM(CAST(1 AS BIGINT) << (54 - mj)) AS BIGINT)
         |      + ($m - COUNT(*)) * (CAST(1 AS BIGINT) << 54) AS s_scaled,
         |    CAST(COUNT(*) AS BIGINT) AS n_filled,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ghash) AS n_exact
         |  FROM gregs
         |), merged AS (
         |  SELECT
         |    CAST(SUM(CAST(1 AS BIGINT) << (54 - mj)) AS BIGINT)
         |      + ($m - COUNT(*)) * (CAST(1 AS BIGINT) << 54) AS s_merged
         |  FROM (SELECT bucket, MAX(mj) AS mj FROM regs GROUP BY 1)
         |), unioned AS (
         |  SELECT s.lang AS scope, e.n_exact,
         |    round($cNum / CAST(s.s_scaled AS DOUBLE), 4) AS hll_est,
         |    s.n_filled, true AS merged_eq
         |  FROM lang_sketch s JOIN lang_exact e ON s.lang = e.lang
         |  UNION ALL
         |  SELECT '__all__', d.n_exact,
         |    round($cNum / CAST(d.s_scaled AS DOUBLE), 4),
         |    d.n_filled, d.s_scaled = m.s_merged
         |  FROM direct d CROSS JOIN merged m
         |)
         |SELECT scope, n_exact, hll_est, n_filled, merged_eq,
         |  round(abs(hll_est - CAST(n_exact AS DOUBLE))
         |    / CAST(n_exact AS DOUBLE), 6) AS rel_err
         |FROM unioned ORDER BY scope""".stripMargin
    },

    // q336: the same greedy rounds, unrolled — pick_i via ORDER BY
    // gained DESC, source LIMIT 1; covered_i chains the term union.
    "q336_set_cover" -> {
      def pick(i: Int): String = {
        val notPicked =
          if (i == 1) ""
          else "WHERE source NOT IN (" +
            (1 until i).map(j => s"SELECT source FROM p$j").mkString(" UNION ALL ") + ")" +
            s" AND h NOT IN (SELECT h FROM c${i - 1})"
        val cov =
          if (i == 1) s"SELECT DISTINCT h FROM st WHERE source IN (SELECT source FROM p1)"
          else s"SELECT h FROM c${i - 1} UNION SELECT h FROM st WHERE source IN (SELECT source FROM p$i)"
        s"""p$i AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS gained
           |  FROM st $notPicked
           |  GROUP BY 1 ORDER BY gained DESC, source LIMIT 1
           |), c$i AS ($cov)""".stripMargin
      }
      val rounds = (1 to 5).map(pick).mkString(",\n")
      val out = (1 to 5).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS round, source, gained,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c$i) AS cum_covered
           |FROM p$i""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH docs AS (
         |  SELECT source, string_split(text, ' ') AS a FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3
         |), tri AS (
         |  SELECT DISTINCT source,
         |    a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS g
         |  FROM docs, unnest(range(1, len(a) - 1)) AS u(i)
         |), st AS (
         |  SELECT DISTINCT source, CAST(CAST(md5_number_upper(g) AS HUGEINT)
         |    % 2305843009213693951 AS BIGINT) AS h
         |  FROM tri
         |), uni AS (SELECT COUNT(DISTINCT h) AS n FROM st),
         |$rounds
         |SELECT round, source, gained, cum_covered,
         |  round(CAST(cum_covered AS DOUBLE) / (SELECT CAST(n AS DOUBLE)
         |    FROM uni), 6) AS coverage_frac
         |FROM ($out) ORDER BY round""".stripMargin
    },

    // q337: same 6-band grain; EMD numerator in exact integers
    // (|cum_g·N − cum_G·n_g|), one final double division.
    "q337_anonymity_audit" ->
      """WITH rows_ AS (
        |  SELECT c_mktsegment AS segment, n_name AS nation,
        |    least(greatest((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |      AS BIGINT) + 100000) // 200000, 0), 5) AS band
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |), gb AS (
        |  SELECT segment, nation, band, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM rows_ GROUP BY 1, 2, 3
        |), spine AS (
        |  SELECT g.segment, g.nation, b.band
        |  FROM (SELECT DISTINCT segment, nation FROM gb) g
        |  CROSS JOIN (SELECT unnest(range(0, 6)) AS band) b
        |), grp AS (
        |  SELECT s.segment, s.nation, s.band, COALESCE(gb.cnt, 0) AS cnt,
        |    SUM(COALESCE(gb.cnt, 0)) OVER (PARTITION BY s.segment, s.nation
        |      ORDER BY s.band) AS cum_g
        |  FROM spine s LEFT JOIN gb
        |    ON s.segment = gb.segment AND s.nation = gb.nation
        |      AND s.band = gb.band
        |), gcum AS (
        |  SELECT b.band,
        |    SUM(COALESCE(x.gcnt, 0)) OVER (ORDER BY b.band) AS cum_n
        |  FROM (SELECT unnest(range(0, 6)) AS band) b
        |  LEFT JOIN (SELECT band, CAST(COUNT(*) AS BIGINT) AS gcnt
        |    FROM rows_ GROUP BY 1) x ON b.band = x.band
        |), ng AS (
        |  SELECT segment, nation, CAST(SUM(cnt) AS BIGINT) AS n_g,
        |    CAST(COUNT(*) AS BIGINT) AS l_diversity
        |  FROM gb GROUP BY 1, 2
        |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM rows_),
        |emd AS (
        |  SELECT g.segment, g.nation,
        |    CAST(SUM(abs(g.cum_g * t.n_total - gl.cum_n * n.n_g))
        |      AS BIGINT) AS emd_num,
        |    MAX(t.n_total) AS n_total
        |  FROM grp g
        |  JOIN gcum gl ON g.band = gl.band
        |  JOIN ng n ON g.segment = n.segment AND g.nation = n.nation
        |  CROSS JOIN tot t
        |  WHERE g.band < 5
        |  GROUP BY 1, 2
        |)
        |SELECT n.segment, n.nation, n.n_g, n.l_diversity,
        |  round(CAST(e.emd_num AS DOUBLE)
        |    / CAST(n.n_g * e.n_total * 5 AS DOUBLE), 6) AS emd,
        |  n.l_diversity >= 3 AS l_ok,
        |  round(CAST(e.emd_num AS DOUBLE)
        |    / CAST(n.n_g * e.n_total * 5 AS DOUBLE), 6) <= 0.2 AS t_ok
        |FROM ng n JOIN emd e
        |  ON n.segment = e.segment AND n.nation = e.nation
        |ORDER BY n.segment, n.nation""".stripMargin,

    // q338: same prefix-slice cosine ranks (list_dot_product shares the
    // sequential fold order with the compiled DotProduct expression).
    "q338_matryoshka_recall" -> {
      def topk(d: Int, name: String): String =
        s"""$name AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_dot_product(q.v[1:$d], c.v[1:$d])
           |          / (sqrt(list_dot_product(q.v[1:$d], q.v[1:$d]))
           |             * sqrt(list_dot_product(c.v[1:$d], c.v[1:$d])))
           |          DESC, c.vec_id ASC) AS rank
           |    FROM qv q, ev c WHERE c.vec_id <> q.vec_id
           |  ) WHERE rank <= 10
           |)""".stripMargin
      val dims = Seq(8, 16, 32, 64)
      val cte = (topk(64, "truth") +: dims.filter(_ != 64)
        .map(d => topk(d, s"t$d"))).mkString(",\n")
      val rows = dims.map { d =>
        val t = if (d == 64) "truth" else s"t$d"
        s"""SELECT CAST($d AS BIGINT) AS d, n_queries,
           |  round(CAST(sum_hits AS DOUBLE)
           |    / CAST(n_queries * 10 AS DOUBLE), 6) AS mean_recall,
           |  round(CAST(min_hits AS DOUBLE) / 10.0, 6) AS min_recall
           |FROM (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           |    CAST(SUM(hits) AS BIGINT) AS sum_hits,
           |    CAST(MIN(hits) AS BIGINT) AS min_hits
           |  FROM (
           |    SELECT q.query_id, COALESCE(o.hits, 0) AS hits
           |    FROM (SELECT DISTINCT query_id FROM truth) q
           |    LEFT JOIN (
           |      SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS hits
           |      FROM $t a JOIN truth b ON a.query_id = b.query_id
           |        AND a.neighbor_id = b.neighbor_id
           |      GROUP BY 1) o ON q.query_id = o.query_id
           |  )
           |)""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH ev AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), qv AS (SELECT * FROM ev WHERE vec_id < 30),
         |$cte
         |SELECT * FROM ($rows) ORDER BY d""".stripMargin
    },

    // q339: same per-round min-edge picks (distinct wkey kills ties);
    // contraction is CANONICAL min-label CC, recomputed here by
    // recursive closure — independent of the Spark label-prop algorithm.
    "q339_boruvka_mst" -> {
      def round(r: Int): String =
        s"""ce_$r AS MATERIALIZED (
           |  SELECT e.wkey, e.u, e.v, e.w, a.comp AS cu, b.comp AS cv
           |  FROM edges e
           |  JOIN lab_${r - 1} a ON e.u = a.node
           |  JOIN lab_${r - 1} b ON e.v = b.node
           |  WHERE a.comp <> b.comp
           |), dir_$r AS (
           |  SELECT cu AS c, wkey, u, v, w, cu, cv FROM ce_$r
           |  UNION ALL
           |  SELECT cv, wkey, u, v, w, cu, cv FROM ce_$r
           |), ch_$r AS (
           |  SELECT DISTINCT wkey, u, v, w, cu, cv FROM (
           |    SELECT d.*, row_number() OVER (PARTITION BY c ORDER BY wkey)
           |      AS rn FROM dir_$r d
           |  ) WHERE rn = 1
           |), sym_$r AS (
           |  SELECT cu AS a, cv AS b FROM ch_$r
           |  UNION SELECT cv, cu FROM ch_$r
           |), reach_$r(node, rt) AS (
           |  SELECT a, a FROM sym_$r
           |  UNION
           |  SELECT e.a, re.rt FROM sym_$r e JOIN reach_$r re
           |    ON re.node = e.b
           |), cmap_$r AS (
           |  SELECT node AS oldc, MIN(rt) AS newc FROM reach_$r GROUP BY 1
           |), lab_$r AS MATERIALIZED (
           |  SELECT l.node, COALESCE(c.newc, l.comp) AS comp
           |  FROM lab_${r - 1} l LEFT JOIN cmap_$r c ON l.comp = c.oldc
           |)""".stripMargin
      val rounds = (1 to 5).map(round).mkString(",\n")
      val out = (1 to 5).map(r =>
        s"SELECT u, v, w, CAST($r AS BIGINT) AS round FROM ch_$r")
        .mkString(" UNION ALL ")
      s"""WITH RECURSIVE ed AS MATERIALIZED (
         |  SELECT least(c.c_nationkey, s.s_nationkey) AS u,
         |    greatest(c.c_nationkey, s.s_nationkey) AS v,
         |    CAST(MIN(abs(datediff('day', o.o_orderdate, l.l_shipdate)) + 1)
         |      AS BIGINT) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  WHERE c.c_nationkey <> s.s_nationkey
         |  GROUP BY 1, 2
         |), edges AS MATERIALIZED (
         |  SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, w,
         |    w * 10000 + u * 31 + v AS wkey
         |  FROM ed
         |), nodes AS (
         |  SELECT DISTINCT u AS node FROM edges
         |  UNION SELECT DISTINCT v FROM edges
         |), lab_0 AS (SELECT node, node AS comp FROM nodes),
         |$rounds
         |SELECT * FROM ($out) ORDER BY w, u, v""".stripMargin
    },

    // q340: identical Hilbert level chain (shared generator, `//`
    // spelling), 8-bit morton interleave, same rank-gap audit.
    "q340_hilbert_locality" -> {
      val interleave = (0 until 8).map(b =>
        s"(((cx >> $b) & 1) << ${2 * b}) + (((cy >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      val chain = graft.queries.EvalQueries
        .hilbertLevels((a, b) => s"($a // $b)")
        .foldLeft("SELECT cx, cy, cx AS hx0, cy AS hy0, " +
          "CAST(0 AS BIGINT) AS hd0 FROM pts") { case (inner, exprs) =>
          s"SELECT *, ${exprs.mkString(", ")} FROM ($inner)"
        }
      s"""WITH pts AS (
         |  SELECT DISTINCT
         |    least(CAST(date_diff('day', DATE '1992-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) // 10, 255) AS cx,
         |    least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) // 200000, 255) AS cy
         |  FROM orders
         |), hil AS ($chain), keyed AS MATERIALIZED (
         |  SELECT cx, cy,
         |    row_number() OVER (ORDER BY hd8) AS rh,
         |    row_number() OVER (ORDER BY ($interleave)) AS rm,
         |    row_number() OVER (ORDER BY cx * 256 + cy) AS rr
         |  FROM hil
         |), edges AS (
         |  SELECT abs(a.rh - b.rh) AS gh, abs(a.rm - b.rm) AS gm,
         |    abs(a.rr - b.rr) AS gr
         |  FROM keyed a JOIN keyed b ON b.cx = a.cx + 1 AND b.cy = a.cy
         |  UNION ALL
         |  SELECT abs(a.rh - b.rh), abs(a.rm - b.rm), abs(a.rr - b.rr)
         |  FROM keyed a JOIN keyed b ON b.cx = a.cx AND b.cy = a.cy + 1
         |), sq(ordering, md) AS (
         |  SELECT 'hilbert', abs(a.cx - b.cx) + abs(a.cy - b.cy)
         |  FROM keyed a JOIN keyed b ON b.rh = a.rh + 1
         |  UNION ALL
         |  SELECT 'morton', abs(a.cx - b.cx) + abs(a.cy - b.cy)
         |  FROM keyed a JOIN keyed b ON b.rm = a.rm + 1
         |  UNION ALL
         |  SELECT 'row_major', abs(a.cx - b.cx) + abs(a.cy - b.cy)
         |  FROM keyed a JOIN keyed b ON b.rr = a.rr + 1
         |), seqa AS (
         |  SELECT ordering,
         |    round(CAST(SUM(md) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         |      AS seq_avg_dist,
         |    CAST(MAX(md) AS BIGINT) AS seq_max_dist
         |  FROM sq GROUP BY 1
         |), spat(ordering, n_edges, avg_rank_gap, max_rank_gap) AS (
         |  SELECT 'hilbert', CAST(COUNT(*) AS BIGINT),
         |    round(CAST(SUM(gh) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4),
         |    CAST(MAX(gh) AS BIGINT)
         |  FROM edges
         |  UNION ALL
         |  SELECT 'morton', CAST(COUNT(*) AS BIGINT),
         |    round(CAST(SUM(gm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4),
         |    CAST(MAX(gm) AS BIGINT)
         |  FROM edges
         |  UNION ALL
         |  SELECT 'row_major', CAST(COUNT(*) AS BIGINT),
         |    round(CAST(SUM(gr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4),
         |    CAST(MAX(gr) AS BIGINT)
         |  FROM edges
         |)
         |SELECT s.ordering, s.n_edges, s.avg_rank_gap, s.max_rank_gap,
         |  q.seq_avg_dist, q.seq_max_dist
         |FROM spat s JOIN seqa q ON s.ordering = q.ordering
         |ORDER BY s.ordering""".stripMargin
    },

    // q341: same two layouts (arrival-keyed and date-sorted 1000-row
    // files), same shared workload VALUES, all-integer zone math.
    "q341_zonemap_advisor" -> {
      val values = graft.queries.EvalQueries.zonemapWorkload
        .map { case (p, dlo, dhi, plo, phi) =>
          s"('$p', CAST($dlo AS BIGINT), CAST($dhi AS BIGINT)," +
            s" CAST($plo AS BIGINT), CAST($phi AS BIGINT))"
        }.mkString(",\n    ")
      s"""WITH base AS MATERIALIZED (
         |  SELECT o_orderkey,
         |    CAST(date_diff('day', DATE '1992-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM orders
         |), both_ AS (
         |  SELECT 'arrival' AS layout, o_orderkey // 1000 AS fid, d, cents
         |  FROM base
         |  UNION ALL
         |  SELECT 'date_clustered',
         |    (row_number() OVER (ORDER BY d, o_orderkey) - 1) // 1000,
         |    d, cents
         |  FROM base
         |), zones AS MATERIALIZED (
         |  SELECT layout, fid, MIN(d) AS dmin, MAX(d) AS dmax,
         |    MIN(cents) AS pmin, MAX(cents) AS pmax,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM both_ GROUP BY 1, 2
         |), preds(pred, dlo, dhi, plo, phi) AS (
         |  VALUES
         |    $values
         |), hit AS (
         |  SELECT z.layout, p.pred, CAST(COUNT(*) AS BIGINT) AS files_hit,
         |    CAST(SUM(z.n_rows) AS BIGINT) AS rows_in_hit
         |  FROM zones z CROSS JOIN preds p
         |  WHERE z.dmax >= p.dlo AND z.dmin < p.dhi
         |    AND z.pmax >= p.plo AND z.pmin < p.phi
         |  GROUP BY 1, 2
         |), matching AS (
         |  SELECT p.pred, CAST(COUNT(*) AS BIGINT) AS rows_match
         |  FROM base b CROSS JOIN preds p
         |  WHERE b.d >= p.dlo AND b.d < p.dhi
         |    AND b.cents >= p.plo AND b.cents < p.phi
         |  GROUP BY 1
         |), totals AS (
         |  SELECT layout, CAST(COUNT(*) AS BIGINT) AS files_total
         |  FROM zones GROUP BY 1
         |)
         |SELECT t.layout, p.pred, t.files_total,
         |  COALESCE(h.files_hit, 0) AS files_hit,
         |  COALESCE(h.rows_in_hit, 0) AS rows_in_hit,
         |  COALESCE(m.rows_match, 0) AS rows_match,
         |  round(1.0 - CAST(COALESCE(h.files_hit, 0) AS DOUBLE)
         |    / CAST(t.files_total AS DOUBLE), 6) AS skip_frac,
         |  CASE WHEN COALESCE(h.rows_in_hit, 0) = 0 THEN 0.0
         |    ELSE round(CAST(COALESCE(h.rows_in_hit, 0)
         |        - COALESCE(m.rows_match, 0) AS DOUBLE)
         |      / CAST(h.rows_in_hit AS DOUBLE), 6) END AS waste_frac
         |FROM (SELECT pred FROM preds) p CROSS JOIN totals t
         |LEFT JOIN hit h ON h.layout = t.layout AND h.pred = p.pred
         |LEFT JOIN matching m ON m.pred = p.pred
         |ORDER BY t.layout, p.pred""".stripMargin
    },

    // q342: q23/q44/q54's oracle fragments composed — same canonical
    // (min doc_id) rule, cumulative-union funnel, integer counts.
    "q342_dedup_funnel" ->
      s"""WITH RECURSIVE ${Oracles.minhashPairCtes},
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE) / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs
        |), reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
        |), rm3 AS (
        |  SELECT node AS doc_id FROM (
        |    SELECT node, MIN(r) AS comp FROM reach GROUP BY node
        |  ) WHERE node <> comp
        |), rm1 AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
        |    FROM documents) WHERE doc_id <> keep
        |), rm2 AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(
        |      trim(regexp_replace(regexp_replace(lower(text),
        |        '[^\\p{L}\\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')))) AS keep
        |    FROM documents) WHERE doc_id <> keep
        |), tok AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
        |    AS toks
        |  FROM documents
        |), cum1 AS (SELECT DISTINCT doc_id FROM rm1),
        |cum2 AS (SELECT doc_id FROM rm1 UNION SELECT doc_id FROM rm2),
        |cum3 AS (SELECT doc_id FROM cum2 UNION SELECT doc_id FROM rm3),
        |stages AS (
        |  SELECT CAST(0 AS BIGINT) AS stage_id, '0_raw' AS stage,
        |    CAST(COUNT(*) AS BIGINT) AS docs_kept,
        |    CAST(SUM(toks) AS BIGINT) AS tokens_kept FROM tok
        |  UNION ALL
        |  SELECT 1, '1_exact', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(toks) AS BIGINT)
        |  FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM cum1)
        |  UNION ALL
        |  SELECT 2, '2_normalized', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(toks) AS BIGINT)
        |  FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM cum2)
        |  UNION ALL
        |  SELECT 3, '3_neardup', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(toks) AS BIGINT)
        |  FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM cum3)
        |)
        |SELECT stage_id, stage, docs_kept, tokens_kept,
        |  COALESCE(lag(docs_kept) OVER (ORDER BY stage_id) - docs_kept, 0)
        |    AS docs_removed,
        |  round(CAST(tokens_kept AS DOUBLE) / CAST(first_value(tokens_kept)
        |    OVER (ORDER BY stage_id) AS DOUBLE), 6) AS tok_frac
        |FROM stages ORDER BY stage_id""".stripMargin,

    // q343: same jitter hash, one global running-max window — identical
    // to the blockwise prefix decomposition because max is associative.
    "q343_watermark_advisor" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS tus,
        |    CAST(CAST(md5_number_upper(CAST(event_id AS VARCHAR))
        |      AS HUGEINT) % 2305843009213693951 AS BIGINT) % 120000000
        |      AS jit
        |  FROM events
        |), h AS (
        |  SELECT tus,
        |    max(tus) OVER (ORDER BY tus + jit, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus
        |      AS late_us
        |  FROM e
        |), d(delay_s) AS (VALUES (0), (5), (30), (60), (120))
        |SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN h.late_us > d.delay_s * 1000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
        |  CAST(MAX(h.late_us) AS BIGINT) AS max_late_us,
        |  round(CAST(SUM(CASE WHEN h.late_us > d.delay_s * 1000000
        |      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS drop_frac
        |FROM h CROSS JOIN d
        |GROUP BY d.delay_s ORDER BY delay_s""".stripMargin,

    // q344: same 80/20 doc_id split, same (count desc, token asc)
    // vocab order, integer counts throughout.
    "q344_vocab_oov" -> {
      val sizes = Seq(500, 2000, 8000)
      val rows = sizes.map { n =>
        s"""SELECT CAST($n AS BIGINT) AS vocab_requested,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM vr WHERE rn <= $n)
           |    AS vocab_actual,
           |  round((SELECT CAST(SUM(c) AS DOUBLE) FROM vr WHERE rn <= $n)
           |    / (SELECT CAST(SUM(c) AS DOUBLE) FROM train), 6)
           |    AS train_coverage,
           |  round((SELECT CAST(SUM(ec) AS DOUBLE) FROM ev
           |      WHERE tok NOT IN (SELECT tok FROM vr WHERE rn <= $n))
           |    / (SELECT CAST(SUM(ec) AS DOUBLE) FROM ev), 6)
           |    AS oov_inst_frac,
           |  round((SELECT CAST(COUNT(*) AS DOUBLE) FROM ev
           |      WHERE tok NOT IN (SELECT tok FROM vr WHERE rn <= $n))
           |    / (SELECT CAST(COUNT(*) AS DOUBLE) FROM ev), 6)
           |    AS oov_type_frac""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS a FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3
         |), toks AS MATERIALIZED (
         |  SELECT doc_id, a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS tok
         |  FROM docs, unnest(range(1, len(a) - 1)) AS u(i)
         |), train AS MATERIALIZED (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM toks WHERE doc_id % 10 < 8 GROUP BY 1
         |), ev AS MATERIALIZED (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS ec
         |  FROM toks WHERE doc_id % 10 >= 8 GROUP BY 1
         |), vr AS MATERIALIZED (
         |  SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok ASC)
         |    AS rn
         |  FROM train
         |)
         |SELECT * FROM ($rows) ORDER BY vocab_requested""".stripMargin
    },

    // q345: same redelivery model; global running-max window over event
    // time in arrival order (associative ≡ the blockwise form).
    "q345_dedup_ttl_advisor" ->
      """WITH base AS (
        |  SELECT event_id, epoch_us(ts) AS tus,
        |    CAST(CAST(md5_number_upper(CAST(event_id AS VARCHAR))
        |      AS HUGEINT) % 2305843009213693951 AS BIGINT) AS h
        |  FROM events
        |), d AS (
        |  SELECT event_id, tus, tus + h % 120000000 AS arrival, 0 AS copy
        |  FROM base
        |  UNION ALL
        |  SELECT event_id, tus,
        |    tus + h % 120000000 + 1 + h % 600000000, 1
        |  FROM base WHERE h % 7 = 0
        |), g AS (
        |  SELECT event_id, copy,
        |    max(tus) OVER (ORDER BY arrival, event_id, copy
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus
        |      AS evict_gap
        |  FROM d
        |), gaps AS (SELECT event_id, evict_gap FROM g WHERE copy = 1
        |), t(ttl_s) AS (VALUES (60), (180), (600), (1200))
        |SELECT CAST(t.ttl_s AS BIGINT) AS ttl_s,
        |  CAST(COUNT(*) AS BIGINT) AS n_redeliveries,
        |  CAST(SUM(CASE WHEN gaps.evict_gap > t.ttl_s * 1000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS missed,
        |  CAST(MAX(gaps.evict_gap) AS BIGINT) AS max_evict_gap_us,
        |  CAST(COUNT(*) AS BIGINT) - CAST(SUM(CASE WHEN gaps.evict_gap
        |    > t.ttl_s * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS caught,
        |  round(CAST(SUM(CASE WHEN gaps.evict_gap > t.ttl_s * 1000000
        |      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS miss_frac
        |FROM gaps CROSS JOIN t
        |GROUP BY t.ttl_s ORDER BY ttl_s""".stripMargin,

    // q346: same fixed widths + measured string lengths, integer costs.
    "q346_join_strategy" ->
      """WITH li AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS rows_, CAST(COUNT(*) * 68
        |    + SUM(len(l_returnflag) + len(l_linestatus)) AS BIGINT)
        |    AS bytes_
        |  FROM lineitem
        |), ord AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS rows_, CAST(COUNT(*) * 32
        |    + SUM(len(o_orderstatus) + len(o_orderpriority)) AS BIGINT)
        |    AS bytes_
        |  FROM orders
        |), cust AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS rows_, CAST(COUNT(*) * 20
        |    + SUM(len(c_name) + len(c_mktsegment)) AS BIGINT) AS bytes_
        |  FROM customer
        |), prt AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS rows_, CAST(COUNT(*) * 20
        |    + SUM(len(p_name) + len(p_brand) + len(p_type)) AS BIGINT)
        |    AS bytes_
        |  FROM part
        |), joins AS (
        |  SELECT 'lineitem_orders' AS join_name, a.rows_ AS rows_a,
        |    b.rows_ AS rows_b, a.bytes_ AS bytes_a, b.bytes_ AS bytes_b
        |  FROM li a CROSS JOIN ord b
        |  UNION ALL
        |  SELECT 'orders_customer', a.rows_, b.rows_, a.bytes_, b.bytes_
        |  FROM ord a CROSS JOIN cust b
        |  UNION ALL
        |  SELECT 'lineitem_part', a.rows_, b.rows_, a.bytes_, b.bytes_
        |  FROM li a CROSS JOIN prt b
        |)
        |SELECT join_name, rows_a, rows_b, bytes_a, bytes_b,
        |  bytes_a + bytes_b AS smj_shuffle_bytes,
        |  least(bytes_a, bytes_b) * 1000 AS bc_replicated_bytes,
        |  (bytes_a + bytes_b) // least(bytes_a, bytes_b)
        |    AS breakeven_execs,
        |  least(bytes_a, bytes_b) <= 10485760 AS default_would_broadcast,
        |  CASE WHEN least(bytes_a, bytes_b) * 1000 < bytes_a + bytes_b
        |    THEN 'broadcast' ELSE 'sort_merge' END AS recommended
        |FROM joins ORDER BY join_name""".stripMargin,

    // q347: same de Bruijn successor census, integer counts.
    "q347_ngram_privacy" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS a
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), tri AS (
        |  SELECT DISTINCT doc_id, lang,
        |    a[i] || ' ' || a[i + 1] AS pre, a[i + 2] AS nxt
        |  FROM docs, unnest(range(1, len(a) - 1)) AS u(i)
        |), br AS (
        |  SELECT doc_id, lang, CAST(MAX(n_succ) AS BIGINT) AS max_branch
        |  FROM (
        |    SELECT doc_id, lang, pre, CAST(COUNT(*) AS BIGINT) AS n_succ
        |    FROM tri GROUP BY 1, 2, 3
        |  ) GROUP BY 1, 2
        |)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN max_branch = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_reconstructible,
        |  round(CAST(SUM(CASE WHEN max_branch = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS reconstructible_frac,
        |  CAST(MAX(max_branch) AS BIGINT) AS max_branch,
        |  round(CAST(SUM(max_branch) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
        |    4) AS avg_max_branch
        |FROM br GROUP BY lang ORDER BY lang""".stripMargin,

    // q348: the shared 64-hash signature re-banded three ways; same
    // 100-cap, same exact truth as q292, integer pair counts.
    "q348_lsh_sweep" -> {
      def bandCtes(bands: Int, rows: Int): String = {
        val sfx = s"${bands}_$rows"
        s"""bands_$sfx AS (
           |  SELECT doc_id, unnest([
           |    ${(0 until bands).map(bi => s"'$bi|' || ${(0 until rows)
                  .map(ri => s"sig[${bi * rows + ri + 1}]")
                  .mkString(" || '|' || ")}").mkString(",\n    ")}
           |  ]) AS band FROM mh
           |), capped_$sfx AS (
           |  SELECT doc_id, band FROM bands_$sfx
           |  QUALIFY count(*) OVER (PARTITION BY band) <= 100
           |), cand_$sfx AS MATERIALIZED (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM capped_$sfx a JOIN capped_$sfx b
           |    ON a.band = b.band AND a.doc_id < b.doc_id
           |)""".stripMargin
      }
      val cfgs = Seq((32, 2), (16, 4), (8, 8))
      val rows = cfgs.map { case (b, r) =>
        val sfx = s"${b}_$r"
        s"""SELECT CAST($b AS BIGINT) AS bands,
           |  CAST($r AS BIGINT) AS rows_per_band,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_$sfx)
           |    AS n_candidates,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
           |   WHERE EXISTS (SELECT 1 FROM cand_$sfx c
           |     WHERE c.id_a = t.id_a AND c.id_b = t.id_b)) AS n_hits,
           |  (SELECT n_truth FROM nt) AS n_exact""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH ${Oracles.minhashPairCtes},
         |tr0 AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM documents a JOIN documents b
         |    ON a.lang = b.lang AND a.doc_id < b.doc_id
         |    AND abs(a.n_chars - b.n_chars) <= 16
         |), truth AS MATERIALIZED (
         |  SELECT id_a, id_b FROM tr0
         |  JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b
         |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
         |    / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
         |), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
         |${cfgs.map { case (b, r) => bandCtes(b, r) }.mkString(",\n")}
         |SELECT bands, rows_per_band, n_candidates, n_hits, n_exact,
         |  round(CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
         |    AS recall,
         |  round(CAST(n_candidates AS DOUBLE) / CAST(n_exact AS DOUBLE), 4)
         |    AS cost_ratio
         |FROM ($rows) ORDER BY rows_per_band""".stripMargin
    },

    // q349: same rarity-ordered prefixes (df asc, gram asc), integer
    // prefix length, same exact truth and 16×4 LSH contrast.
    "q349_prefix_filter_join" ->
      s"""WITH ${Oracles.minhashPairCtes},
         |grams AS (
         |  SELECT doc_id, unnest(sg) AS g FROM sh
         |), dfreq AS (
         |  SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM grams GROUP BY 1
         |), sizes AS (
         |  SELECT doc_id, CAST(len(sg) AS BIGINT) AS sz FROM sh
         |  WHERE len(sg) > 0
         |), pref AS MATERIALIZED (
         |  SELECT doc_id, g, sz FROM (
         |    SELECT gr.doc_id, gr.g, s.sz,
         |      row_number() OVER (PARTITION BY gr.doc_id
         |        ORDER BY d.df, gr.g) AS rnk
         |    FROM grams gr JOIN dfreq d ON gr.g = d.g
         |    JOIN sizes s ON gr.doc_id = s.doc_id
         |  ) WHERE rnk <= sz - ((sz + 1) // 2) + 1
         |), pcand AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id
         |  WHERE least(a.sz, b.sz) * 2 >= greatest(a.sz, b.sz)
         |), pverified AS MATERIALIZED (
         |  SELECT id_a, id_b FROM pcand
         |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
         |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
         |    / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
         |), tr0 AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM documents a JOIN documents b
         |    ON a.lang = b.lang AND a.doc_id < b.doc_id
         |    AND abs(a.n_chars - b.n_chars) <= 16
         |), truth AS MATERIALIZED (
         |  SELECT id_a, id_b FROM tr0
         |  JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
         |  WHERE CAST(len(list_intersect(sa.sg, sb.sg)) AS DOUBLE)
         |    / CAST(len(list_distinct(sa.sg || sb.sg)) AS DOUBLE) >= 0.5
         |), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
         |res AS (
         |  SELECT 'prefix_filter' AS blocker,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pcand) AS n_candidates,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
         |     WHERE EXISTS (SELECT 1 FROM pverified v
         |       WHERE v.id_a = t.id_a AND v.id_b = t.id_b)) AS n_found,
         |    (SELECT n_truth FROM nt) AS n_truth
         |  UNION ALL
         |  SELECT 'minhash_16x4',
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand),
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
         |     WHERE EXISTS (SELECT 1 FROM cand c
         |       WHERE c.id_a = t.id_a AND c.id_b = t.id_b)),
         |    (SELECT n_truth FROM nt)
         |)
         |SELECT blocker, n_candidates, n_found, n_truth,
         |  round(CAST(n_found AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
         |    AS recall,
         |  round(CAST(n_candidates AS DOUBLE) / CAST(n_truth AS DOUBLE), 4)
         |    AS cost_ratio
         |FROM res ORDER BY blocker""".stripMargin,

    // q350: same cell grain, same three bucketings, same integer
    // micro-unit estimate and error sums (order-free by construction).
    "q350_histogram_bakeoff" -> {
      val values = graft.queries.EvalQueries.histBakeoffPreds
        .map { case (p, lo, hi) =>
          s"('$p', CAST($lo AS BIGINT), CAST($hi AS BIGINT))"
        }.mkString(",\n    ")
      def scheme(src: String, name: String): String =
        s"""SELECT '$name' AS histogram,
           |  CAST(COUNT(*) AS BIGINT) AS n_preds,
           |  round(CAST(SUM(relerr_micro) AS DOUBLE)
           |    / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 4)
           |    AS mean_rel_err,
           |  round(CAST(MAX(relerr_micro) AS DOUBLE) / 1000000.0, 4)
           |    AS max_rel_err
           |FROM (
           |  SELECT p.pred,
           |    CAST(floor(abs(CAST(COALESCE(e.est_micro, 0) AS DOUBLE)
           |        / 1000000.0 - CAST(COALESCE(x.exact, 0) AS DOUBLE))
           |      / greatest(CAST(COALESCE(x.exact, 0) AS DOUBLE), 1.0)
           |      * 1000000.0) AS BIGINT) AS relerr_micro
           |  FROM preds p
           |  LEFT JOIN (
           |    SELECT pred, CAST(SUM((ov * bcnt * 1000000)
           |      // (bmax - bmin + 1)) AS BIGINT) AS est_micro
           |    FROM (
           |      SELECT p2.pred, greatest(0, least(p2.phi, b.bmax)
           |        - greatest(p2.plo, b.bmin) + 1) AS ov,
           |        b.bcnt, b.bmax, b.bmin
           |      FROM (
           |        SELECT bkt, MIN(cell) AS bmin, MAX(cell) AS bmax,
           |          CAST(SUM(cnt) AS BIGINT) AS bcnt
           |        FROM $src GROUP BY 1
           |      ) b CROSS JOIN preds p2
           |    ) GROUP BY 1
           |  ) e ON e.pred = p.pred
           |  LEFT JOIN (
           |    SELECT p3.pred, CAST(SUM(c.cnt) AS BIGINT) AS exact
           |    FROM cells c JOIN preds p3
           |      ON c.cell >= p3.plo AND c.cell <= p3.phi
           |    GROUP BY 1
           |  ) x ON x.pred = p.pred
           |)""".stripMargin
      s"""WITH cells AS MATERIALIZED (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT) // 1000000 AS cell,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM orders GROUP BY 1
         |), bounds AS (
         |  SELECT MIN(cell) AS minc, MAX(cell) AS maxc,
         |    CAST(SUM(cnt) AS BIGINT) AS total
         |  FROM cells
         |), base AS MATERIALIZED (
         |  SELECT c.cell, c.cnt, b.minc, b.maxc, b.total
         |  FROM cells c CROSS JOIN bounds b
         |), ew AS (
         |  SELECT cell, cnt, ((cell - minc) * 8) // (maxc - minc + 1)
         |    AS bkt
         |  FROM base
         |), ed AS (
         |  SELECT cell, cnt, least((cumb * 8) // total, 7) AS bkt FROM (
         |    SELECT cell, cnt, total, COALESCE(SUM(cnt) OVER (
         |      ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND 1 PRECEDING), 0) AS cumb
         |    FROM base)
         |), cuts AS MATERIALIZED (
         |  SELECT cell AS cut FROM (
         |    SELECT cell, lag(cnt) OVER (ORDER BY cell) AS prev,
         |      abs(cnt - lag(cnt) OVER (ORDER BY cell)) AS ad
         |    FROM base)
         |  WHERE prev IS NOT NULL
         |  ORDER BY ad DESC, cell ASC LIMIT 7
         |), md AS (
         |  SELECT b.cell, b.cnt,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cuts
         |     WHERE cut <= b.cell) AS bkt
         |  FROM base b
         |), preds(pred, plo, phi) AS (
         |  VALUES
         |    $values
         |)
         |SELECT * FROM (
         |  ${scheme("ew", "equi_width")}
         |  UNION ALL
         |  ${scheme("ed", "equi_depth")}
         |  UNION ALL
         |  ${scheme("md", "maxdiff")}
         |) ORDER BY histogram""".stripMargin
    },

    // q351: same path→transition build; 12 unrolled integer micro-unit
    // rounds per variant (Σ T·p then one floor-div — exact mirror of
    // the driver arithmetic).
    "q351_markov_attribution" -> {
      val channels = Seq("click", "error", "signup", "view")
      def rounds(v: String): String = {
        val tv = if (v == "base") "tm"
          else s"(SELECT * FROM tm WHERE dst <> '$v')"
        val chain = (1 to 12).map { k =>
          s"""p_${v}_$k AS (
             |  SELECT s.state, CASE WHEN s.state = 'purchase'
             |    THEN CAST(1000000 AS BIGINT)
             |    ELSE CAST(COALESCE((SELECT SUM(t.tmic * p.pmic)
             |      FROM $tv t JOIN p_${v}_${k - 1} p ON t.dst = p.state
             |      WHERE t.src = s.state), 0) // 1000000 AS BIGINT) END
             |    AS pmic
             |  FROM states s
             |)""".stripMargin
        }.mkString(",\n")
        s"""p_${v}_0 AS (
           |  SELECT state, CASE WHEN state = 'purchase'
           |    THEN CAST(1000000 AS BIGINT) ELSE CAST(0 AS BIGINT) END
           |    AS pmic
           |  FROM states
           |),
           |$chain""".stripMargin
      }
      val effRows = channels.map { c =>
        s"""SELECT '$c' AS channel,
           |  (SELECT pmic FROM p_base_12 WHERE state = 'START')
           |    AS p_base_micro,
           |  (SELECT pmic FROM p_${c}_12 WHERE state = 'START')
           |    AS p_removed_micro""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH ev AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS rn
         |  FROM events
         |), fp AS (
         |  SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN rn END)
         |    OVER (PARTITION BY user_id) AS fpn
         |  FROM ev
         |), kept AS (
         |  SELECT *, lead(event_type) OVER (PARTITION BY user_id
         |    ORDER BY tus, event_id) AS nxt
         |  FROM fp WHERE fpn IS NULL OR rn <= fpn
         |), trans AS MATERIALIZED (
         |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    SELECT event_type AS src, COALESCE(nxt, 'null') AS dst
         |    FROM kept WHERE event_type <> 'purchase'
         |    UNION ALL
         |    SELECT 'START', event_type FROM kept WHERE rn = 1
         |  ) GROUP BY 1, 2
         |), outc AS (
         |  SELECT src, CAST(SUM(cnt) AS BIGINT) AS outn
         |  FROM trans GROUP BY 1
         |), tm AS MATERIALIZED (
         |  SELECT t.src, t.dst, (t.cnt * 1000000) // o.outn AS tmic
         |  FROM trans t JOIN outc o ON t.src = o.src
         |), states AS MATERIALIZED (
         |  SELECT DISTINCT src AS state FROM tm
         |  UNION SELECT 'purchase'
         |),
         |${(Seq("base") ++ channels).map(rounds).mkString(",\n")},
         |effs AS ($effRows)
         |SELECT channel, p_base_micro, p_removed_micro,
         |  round(CASE WHEN p_base_micro = 0 THEN 0.0
         |    ELSE CAST(p_base_micro - p_removed_micro AS DOUBLE)
         |      / CAST(p_base_micro AS DOUBLE) END, 6) AS removal_effect,
         |  round(CASE WHEN (SELECT SUM(e2.p_base_micro - e2.p_removed_micro)
         |      FROM effs e2) = 0 THEN 0.0
         |    ELSE CAST(p_base_micro - p_removed_micro AS DOUBLE)
         |      / CAST((SELECT SUM(e2.p_base_micro - e2.p_removed_micro)
         |        FROM effs e2) AS DOUBLE)
         |    END, 6) AS attribution_share
         |FROM effs ORDER BY channel""".stripMargin
    },

    // q352: identical per-supplier replay recurrences as recursive
    // CTEs; pure integer/list ops.
    "q352_cache_replay" -> {
      val configs = Seq(("lru", 4), ("lru", 16), ("fifo", 4), ("fifo", 16))
      def rec(policy: String, cap: Int): String = {
        val sfx = s"${policy}_$cap"
        val hit =
          if (policy == "lru")
            s"list_prepend(a[idx + 1], list_filter(q, e -> e <> a[idx + 1]))"
          else "q"
        s"""rec_$sfx(s, a, idx, q, h) AS (
           |  SELECT s, a, 0, CAST([] AS BIGINT[]), CAST(0 AS BIGINT)
           |  FROM accs
           |  UNION ALL
           |  SELECT s, a, idx + 1,
           |    CASE WHEN list_contains(q, a[idx + 1]) THEN $hit
           |      ELSE (list_prepend(a[idx + 1], q))[1:$cap] END,
           |    CASE WHEN list_contains(q, a[idx + 1]) THEN h + 1
           |      ELSE h END
           |  FROM rec_$sfx WHERE idx < len(a)
           |), res_$sfx AS (
           |  SELECT CAST(SUM(len(a)) AS BIGINT) AS n_accesses,
           |    CAST(SUM(h) AS BIGINT) AS hits
           |  FROM rec_$sfx WHERE idx = len(a)
           |)""".stripMargin
      }
      val rows = configs.map { case (p, c) =>
        s"""SELECT '$p' AS policy, CAST($c AS BIGINT) AS cache_size,
           |  n_accesses, hits,
           |  round(CAST(hits AS DOUBLE) / CAST(n_accesses AS DOUBLE), 6)
           |    AS hit_rate
           |FROM res_${p}_$c""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH RECURSIVE accs AS MATERIALIZED (
         |  SELECT l_suppkey AS s,
         |    (list(l_partkey ORDER BY l_orderkey, l_linenumber, l_partkey))[1:512]
         |      AS a
         |  FROM lineitem GROUP BY 1
         |),
         |${configs.map { case (p, c) => rec(p, c) }.mkString(",\n")}
         |SELECT * FROM ($rows)
         |ORDER BY policy, cache_size""".stripMargin
    },

    // q353: same +1/−1 sweep, one global running-sum window per bound
    // (associative ≡ the blockwise form), expiry-first tie order.
    "q353_join_state_advisor" -> {
      val stanzas = Seq(60L, 600L, 3600L).map { t =>
        s"""SELECT CAST($t AS BIGINT) AS bound_s,
           |  CAST(COUNT(*) AS BIGINT) AS n_events,
           |  CAST(MAX(state) AS BIGINT) AS peak_state,
           |  round(CAST(SUM(state) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
           |    4) AS avg_state
           |FROM (
           |  SELECT d, SUM(d) OVER (ORDER BY pt, d, event_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
           |  FROM (
           |    SELECT arrival AS pt, CAST(1 AS BIGINT) AS d, event_id
           |    FROM arr
           |    UNION ALL
           |    SELECT arrival + CAST($t AS BIGINT) * 1000000,
           |      CAST(-1 AS BIGINT), event_id
           |    FROM arr
           |  )
           |) WHERE d = 1""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH arr AS MATERIALIZED (
         |  SELECT event_id, epoch_us(ts)
         |    + CAST(CAST(md5_number_upper(CAST(event_id AS VARCHAR))
         |      AS HUGEINT) % 2305843009213693951 AS BIGINT) % 120000000
         |    AS arrival
         |  FROM events
         |)
         |SELECT * FROM ($stanzas) ORDER BY bound_s""".stripMargin
    },

    // q354: same chunking, same exact run census, same cost minimums.
    "q354_roaring_advisor" ->
      """WITH posts AS (
        |  SELECT DISTINCT c.c_mktsegment AS segment, o.o_orderkey AS k
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |), ch AS (
        |  SELECT segment, k // 4096 AS chunk, k,
        |    lag(k) OVER (PARTITION BY segment, k // 4096 ORDER BY k)
        |      AS prev
        |  FROM posts
        |), agg AS (
        |  SELECT segment, chunk, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> k - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS runs
        |  FROM ch GROUP BY 1, 2
        |), cost AS (
        |  SELECT segment, chunk, n, n * 2 AS c_array,
        |    CAST(512 AS BIGINT) AS c_bitmap, runs * 4 + 2 AS c_run
        |  FROM agg
        |), typed AS (
        |  SELECT *, least(c_array, c_bitmap, c_run) AS best,
        |    CASE WHEN c_run <= c_array AND c_run <= c_bitmap THEN 'run'
        |      WHEN c_array <= c_bitmap THEN 'array'
        |      ELSE 'bitmap' END AS ctype
        |  FROM cost
        |)
        |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(n) AS BIGINT) AS n_values,
        |  CAST(SUM(best) AS BIGINT) AS bytes_roaring,
        |  CAST(SUM(c_array) AS BIGINT) AS bytes_array_only,
        |  CAST(SUM(c_bitmap) AS BIGINT) AS bytes_bitmap_only,
        |  CAST(SUM(CASE WHEN ctype = 'run' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_run_containers,
        |  CAST(SUM(CASE WHEN ctype = 'array' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_array_containers,
        |  CAST(SUM(n) * 4 AS BIGINT) AS bytes_raw,
        |  round(CAST(SUM(n) * 4 AS DOUBLE) / CAST(SUM(best) AS DOUBLE), 4)
        |    AS compression
        |FROM typed GROUP BY segment ORDER BY segment""".stripMargin,

    // q355: same dense ranks, same endpoint interpolation, same
    // floored micro-unit mean.
    "q355_learned_index_audit" ->
      """WITH keys AS (
        |  SELECT k, CAST(row_number() OVER (ORDER BY k) - 1 AS BIGINT)
        |    AS r
        |  FROM (SELECT DISTINCT CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |    * 100 AS BIGINT) AS k FROM orders)
        |), seg AS (
        |  SELECT k, r, r // 256 AS seg FROM keys
        |), ends AS (
        |  SELECT seg, MIN(k) AS k0, MAX(k) AS k1, MIN(r) AS r0,
        |    MAX(r) AS r1
        |  FROM seg GROUP BY 1
        |), eps AS (
        |  SELECT s.seg,
        |    MAX(abs(CASE WHEN e.k1 = e.k0 THEN CAST(e.r0 AS DOUBLE)
        |      ELSE CAST(e.r0 AS DOUBLE) + CAST(s.k - e.k0 AS DOUBLE)
        |        * CAST(e.r1 - e.r0 AS DOUBLE)
        |        / CAST(e.k1 - e.k0 AS DOUBLE) END
        |      - CAST(s.r AS DOUBLE))) AS seg_eps,
        |    CAST(COUNT(*) AS BIGINT) AS seg_n
        |  FROM seg s JOIN ends e ON s.seg = e.seg
        |  GROUP BY 1
        |)
        |SELECT CAST(SUM(seg_n) AS BIGINT) AS n_keys,
        |  CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  round(MAX(seg_eps), 4) AS max_eps,
        |  round(CAST(SUM(CAST(floor(seg_eps * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 4)
        |    AS mean_seg_eps,
        |  round(CAST(SUM(CASE WHEN seg_eps <= 8.0 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_eps_le_8
        |FROM eps""".stripMargin,

    // q356: q330's frame slicing with positions kept; same rarity
    // filters, same offset voting and tie order.
    "q356_clip_alignment" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |), fr AS (
        |  SELECT DISTINCT media_id, CAST(i AS BIGINT) AS idx,
        |    md5(substring(text, i * 16 + 1, 16)) AS fh
        |  FROM media, unnest(range(0,
        |    greatest(CAST(floor(len(text) / 16.0) AS INT) - 1, 0) + 1))
        |    u(i)
        |), hstats AS (
        |  SELECT fh FROM fr GROUP BY fh
        |  HAVING COUNT(DISTINCT media_id) <= 100
        |), mstats AS (
        |  SELECT fh, media_id FROM fr GROUP BY fh, media_id
        |  HAVING COUNT(*) <= 4
        |), rare AS MATERIALIZED (
        |  SELECT f.media_id, f.idx, f.fh
        |  FROM fr f
        |  JOIN hstats h ON f.fh = h.fh
        |  JOIN mstats m ON f.fh = m.fh AND f.media_id = m.media_id
        |), votes AS (
        |  SELECT a.media_id AS a, b.media_id AS b,
        |    a.idx - b.idx AS "offset", CAST(COUNT(*) AS BIGINT) AS v
        |  FROM rare a JOIN rare b
        |    ON a.fh = b.fh AND a.media_id < b.media_id
        |  GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY a, b
        |      ORDER BY v DESC, "offset" ASC) AS rn,
        |    CAST(SUM(v) OVER (PARTITION BY a, b) AS BIGINT) AS total
        |  FROM votes
        |)
        |SELECT a, b, "offset", v AS votes, total AS total_votes,
        |  round(CAST(v AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |    AS align_share
        |FROM ranked WHERE rn = 1 AND v >= 8
        |ORDER BY a, b""".stripMargin,

    // q357: same piece split + q333's recursive FFD fold at cap 512;
    // crossings from the same doc_id-ordered integer prefix sums.
    "q357_packing_tradeoff" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS len
        |  FROM documents
        |), con AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len) AS BIGINT) AS total_tokens,
        |    CAST(SUM(CASE WHEN (e - 1) // 512 > (e - len) // 512
        |      THEN 1 ELSE 0 END) AS BIGINT) AS docs_cut,
        |    CAST(SUM((e - 1) // 512 - (e - len) // 512) AS BIGINT)
        |      AS n_crossings
        |  FROM (
        |    SELECT source, len, SUM(len) OVER (PARTITION BY source
        |      ORDER BY doc_id) AS e
        |    FROM d
        |  ) GROUP BY 1
        |), s AS (
        |  SELECT source, CAST(SUM(len // 512) AS BIGINT) AS full_bins,
        |    list(len % 512 ORDER BY len % 512 DESC)
        |      FILTER (len % 512 > 0) AS sizes
        |  FROM d GROUP BY 1
        |), rec AS (
        |  SELECT source, full_bins, sizes, CAST(0 AS BIGINT) AS idx,
        |    CAST([] AS BIGINT[]) AS bins
        |  FROM s
        |  UNION ALL
        |  SELECT source, full_bins, sizes, idx + 1,
        |    CASE WHEN list_position(
        |        list_transform(bins, r -> r >= sizes[idx + 1]), true) > 0
        |      THEN list_transform(range(1, 1 + len(bins)),
        |        i -> CASE WHEN i = list_position(
        |            list_transform(bins, r -> r >= sizes[idx + 1]), true)
        |          THEN bins[i] - sizes[idx + 1] ELSE bins[i] END)
        |      ELSE list_append(bins, 512 - sizes[idx + 1]) END
        |  FROM rec WHERE idx < len(sizes)
        |), done AS (
        |  SELECT source,
        |    full_bins + CAST(len(bins) AS BIGINT) AS ffd_bins,
        |    CAST(list_sum(bins) AS BIGINT) AS pad_tokens
        |  FROM rec WHERE idx = len(sizes)
        |)
        |SELECT c.source, c.n_docs, c.total_tokens, f.ffd_bins,
        |  COALESCE(f.pad_tokens, 0) AS pad_tokens,
        |  round(CAST(COALESCE(f.pad_tokens, 0) AS DOUBLE)
        |    / CAST(f.ffd_bins * 512 AS DOUBLE), 6) AS ffd_pad_frac,
        |  (c.total_tokens + 511) // 512 AS concat_windows,
        |  c.n_crossings, c.docs_cut,
        |  round(CAST(c.docs_cut AS DOUBLE) / CAST(c.n_docs AS DOUBLE), 6)
        |    AS cut_frac
        |FROM con c JOIN done f ON c.source = f.source
        |ORDER BY c.source""".stripMargin,

    // q358: same md5-mod-32 partition model, same median order
    // statistic and ceil-split arithmetic.
    "q358_aqe_skew_sim" -> {
      def mdh(x: String): String =
        s"CAST(CAST(md5_number_upper($x) AS HUGEINT)" +
          s" % 2305843009213693951 AS BIGINT)"
      val scen = Seq(
        ("uniform_suppkey",
          s"SELECT ${mdh("CAST(l_suppkey AS VARCHAR)")} AS kh FROM lineitem"),
        ("lowcard_quantity",
          s"SELECT ${mdh("CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)")}" +
            " AS kh FROM lineitem"),
        ("planted_hot",
          s"""SELECT CASE WHEN ${mdh("CAST(event_id AS VARCHAR)")} % 10 < 3
             |  THEN ${mdh("'0'")}
             |  ELSE ${mdh("CAST(event_id AS VARCHAR)")} END AS kh
             |FROM events""".stripMargin))
      val stanzas = scen.map { case (name, keySql) =>
        s"""SELECT '$name' AS scenario, m.np AS n_nonempty,
           |  m.median AS median_load, x.max_before, x.n_skewed,
           |  x.max_after, x.n_after,
           |  round(CAST(x.max_before AS DOUBLE) * CAST(m.np AS DOUBLE)
           |    / CAST(m.total AS DOUBLE), 4) AS balance_before,
           |  round(CAST(x.max_after AS DOUBLE) * CAST(x.n_after AS DOUBLE)
           |    / CAST(m.total AS DOUBLE), 4) AS balance_after
           |FROM (
           |  SELECT l.load AS median, s.np, s.total FROM (
           |    SELECT load, row_number() OVER (ORDER BY load, p) AS rn
           |    FROM (SELECT kh % 32 AS p, CAST(COUNT(*) AS BIGINT)
           |      AS load FROM ($keySql) GROUP BY 1) ld0
           |  ) l CROSS JOIN (
           |    SELECT CAST(COUNT(*) AS BIGINT) AS np,
           |      CAST(SUM(load) AS BIGINT) AS total
           |    FROM (SELECT kh % 32 AS p, CAST(COUNT(*) AS BIGINT)
           |      AS load FROM ($keySql) GROUP BY 1) ld1
           |  ) s
           |  WHERE l.rn = (s.np + 1) // 2
           |) m CROSS JOIN (
           |  SELECT CAST(MAX(load) AS BIGINT) AS max_before,
           |    CAST(SUM(CASE WHEN skewed THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_skewed,
           |    CAST(MAX((load + k - 1) // k) AS BIGINT) AS max_after,
           |    CAST(SUM(k) AS BIGINT) AS n_after
           |  FROM (
           |    SELECT load, load > median * 5 AS skewed,
           |      CASE WHEN load > median * 5
           |        THEN (load + median - 1) // median ELSE 1 END AS k
           |    FROM (SELECT kh % 32 AS p, CAST(COUNT(*) AS BIGINT)
           |      AS load FROM ($keySql) GROUP BY 1) ld2
           |    CROSS JOIN (
           |      SELECT l2.load AS median FROM (
           |        SELECT load, row_number() OVER (ORDER BY load, p) AS rn
           |        FROM (SELECT kh % 32 AS p, CAST(COUNT(*) AS BIGINT)
           |          AS load FROM ($keySql) GROUP BY 1) ld3
           |      ) l2 CROSS JOIN (
           |        SELECT CAST(COUNT(*) AS BIGINT) AS np
           |        FROM (SELECT kh % 32 AS p FROM ($keySql) GROUP BY 1) ld4
           |      ) s2
           |      WHERE l2.rn = (s2.np + 1) // 2
           |    ) mm
           |  )
           |) x""".stripMargin
      }.mkString(" UNION ALL ")
      s"""SELECT * FROM (
         |$stanzas
         |) ORDER BY scenario""".stripMargin
    },

    // q359: same filters, same exact intermediate counts.
    "q359_join_order" ->
      """WITH li AS (
        |  SELECT l_orderkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |), ord AS (SELECT o_orderkey, o_custkey FROM orders),
        |cust AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |), lo AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_lo
        |  FROM li JOIN ord ON l_orderkey = o_orderkey
        |), oc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_oc
        |  FROM ord JOIN cust ON o_custkey = c_custkey
        |), loc AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_final
        |  FROM li JOIN ord ON l_orderkey = o_orderkey
        |  JOIN cust ON o_custkey = c_custkey
        |)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM li) AS n_li,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ord) AS n_ord,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cust) AS n_cust,
        |  lo.n_lo AS inter_lo_first, oc.n_oc AS inter_oc_first,
        |  loc.n_final,
        |  CASE WHEN lo.n_lo <= oc.n_oc THEN '(lineitem_orders)_customer'
        |    ELSE 'lineitem_(orders_customer)' END AS recommended,
        |  round(CAST(abs(lo.n_lo - oc.n_oc) AS DOUBLE)
        |    / CAST(greatest(least(lo.n_lo, oc.n_oc), 1) AS DOUBLE), 4)
        |    AS cost_gap_ratio
        |FROM lo CROSS JOIN oc CROSS JOIN loc""".stripMargin,

    // q360: same 2000-orderkey blocks, same distinct-key census.
    "q360_partial_agg_advisor" -> {
      val gs = Seq(
        ("suppkey", "l_suppkey"),
        ("order_line", "l_orderkey * 10 + l_linenumber"),
        ("ship_month",
          "CAST(strftime(CAST(l_shipdate AS TIMESTAMP), '%Y%m') AS BIGINT)"))
      val stanzas = gs.map { case (name, keyExpr) =>
        s"""SELECT '$name' AS grouping,
           |  CAST(COUNT(*) AS BIGINT) AS n_blocks,
           |  CAST(SUM(rows_) AS BIGINT) AS n_rows,
           |  CAST(SUM(keys_) AS BIGINT) AS shuffled_after_partial,
           |  round(CAST(SUM(keys_) AS DOUBLE) / CAST(SUM(rows_) AS DOUBLE),
           |    6) AS reduction_ratio,
           |  CAST(SUM(keys_) AS BIGINT) * 10
           |    > CAST(SUM(rows_) AS BIGINT) * 8 AS skip_partial
           |FROM (
           |  SELECT l_orderkey // 2000 AS blk,
           |    CAST(COUNT(*) AS BIGINT) AS rows_,
           |    CAST(COUNT(DISTINCT $keyExpr) AS BIGINT) AS keys_
           |  FROM lineitem GROUP BY 1
           |)""".stripMargin
      }.mkString(" UNION ALL ")
      s"""SELECT * FROM (
         |$stanzas
         |) ORDER BY grouping""".stripMargin
    },

    // q361: same blockwise adjacent census with (o, v) composite order.
    "q361_sortedness_audit" -> {
      def stanza(name: String, from: String, o: String, v: String):
          String =
        s"""SELECT '$name' AS sequence,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ($from)) AS n,
           |  w.desc_w + b.desc_b + 1 AS n_runs,
           |  round(1.0 - CAST(w.desc_w + b.desc_b AS DOUBLE)
           |    / CAST(w.n_adj_w + b.n_adj_b AS DOUBLE), 6)
           |    AS sorted_frac,
           |  CASE WHEN w.desc_w + b.desc_b + 1 = 1 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(length(printf('%b', w.desc_w + b.desc_b))
           |      AS BIGINT) END AS merge_passes
           |FROM (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_adj_w,
           |    CAST(SUM(CASE WHEN v < pv THEN 1 ELSE 0 END) AS BIGINT)
           |      AS desc_w
           |  FROM (
           |    SELECT v, lag(v) OVER (PARTITION BY o // 4096
           |      ORDER BY o, v) AS pv
           |    FROM (SELECT $o AS o, $v AS v FROM ($from) z0)
           |  ) WHERE pv IS NOT NULL
           |) w CROSS JOIN (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_adj_b,
           |    CAST(COALESCE(SUM(CASE WHEN nf < lastv THEN 1 ELSE 0 END),
           |      0) AS BIGINT) AS desc_b
           |  FROM (
           |    SELECT blk, lastv, lead(firstv) OVER (ORDER BY blk) AS nf,
           |      lead(blk) OVER (ORDER BY blk) AS nblk
           |    FROM (
           |      SELECT o // 4096 AS blk,
           |        first(v ORDER BY o, v) AS firstv,
           |        last(v ORDER BY o, v) AS lastv
           |      FROM (SELECT $o AS o, $v AS v FROM ($from) z1)
           |      GROUP BY 1
           |    )
           |  ) WHERE nblk = blk + 1
           |) b""".stripMargin
      val s1 = stanza("orders_price", "SELECT * FROM orders",
        "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val s2 = stanza("orders_date", "SELECT * FROM orders",
        "o_orderkey", "epoch_us(o_orderdate)")
      val s3 = stanza("lineitem_shipdate", "SELECT * FROM lineitem",
        "l_orderkey * 10 + l_linenumber", "epoch_us(l_shipdate)")
      s"""SELECT * FROM (
         |$s1 UNION ALL $s2 UNION ALL $s3
         |) ORDER BY sequence""".stripMargin
    },
  )

  /** Shared vocabulary CTE for the q295/q296 linkage wave: distinct word
    * bigrams of the corpus (the bounded string grain). */
  private def bigramVocabSql: String =
    """tk AS (
      |  SELECT string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2
      |), bg AS (
      |  SELECT DISTINCT t[i] || ' ' || t[i+1] AS s
      |  FROM tk, LATERAL unnest(range(1, len(t))) AS u(i)
      |  WHERE len(t[i] || ' ' || t[i+1]) > 0
      |)""".stripMargin

  /** q236's oracle: one per-n gram level (tokens for n=1, positional
    * slices for n=2,3), each a (count, count-distinct-md5) aggregate. */
  private def distinctNSql: String = {
    def level(n: Int): String = {
      val grams =
        if (n == 1)
          "SELECT source, unnest(string_split(text, ' ')) AS g FROM documents"
        else
          s"""SELECT source, array_to_string(tk[i:i+${n - 1}], ' ') AS g
             |    FROM (SELECT source, string_split(text, ' ') AS tk
             |      FROM documents),
             |      LATERAL unnest(range(1, len(tk) - ${n - 2})) AS u(i)
             |    WHERE len(tk) >= $n""".stripMargin
      s"""SELECT source, CAST($n AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS total_ngrams,
         |  CAST(COUNT(DISTINCT md5(g)) AS BIGINT) AS distinct_ngrams,
         |  round(CAST(COUNT(DISTINCT md5(g)) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE), 6) AS distinct_ratio
         |FROM ($grams) GROUP BY source""".stripMargin
    }
    s"""SELECT * FROM (
       |${level(1)}
       |UNION ALL ${level(2)}
       |UNION ALL ${level(3)}
       |) ORDER BY source, n""".stripMargin
  }

  /** q220's oracle pivots the 8 coalition rows to one and spells every
    * Shapley sum in the identical left-associated term order the Spark
    * reduce produces (weights 1/3, 1/6, 1/6, 1/3 as folded divisions). */
  private def shapleySql: String = {
    val us = (0 to 7).map(m =>
      s"CAST(SUM(CASE WHEN mask = $m THEN nu ELSE 0 END) AS BIGINT) AS u$m," +
        s" CAST(SUM(CASE WHEN mask = $m THEN nc ELSE 0 END) AS BIGINT) AS c$m")
      .mkString(",\n  ")
    val vs = (0 to 7).map(m =>
      s"CASE WHEN u$m > 0 THEN CAST(c$m AS DOUBLE) / CAST(u$m AS DOUBLE)" +
        s" ELSE 0.0 END AS v$m").mkString(",\n  ")
    def shap(pairs: Seq[(Int, Int)]): String = {
      val w = Seq("1.0 / 3.0", "1.0 / 6.0", "1.0 / 6.0", "1.0 / 3.0")
      pairs.zip(w).map { case ((a, b), wt) => s"$wt * (v$a - v$b)" }
        .mkString(" + ")
    }
    def exposed(ms: Seq[Int]): String = ms.map(m => s"u$m").mkString(" + ")
    s"""WITH fl AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
       |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
       |    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS s,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cv
       |  FROM events GROUP BY 1
       |), mt AS (
       |  SELECT v + c * 2 + s * 4 AS mask, CAST(COUNT(*) AS BIGINT) AS nu,
       |    CAST(SUM(cv) AS BIGINT) AS nc
       |  FROM fl GROUP BY 1
       |), one AS (SELECT
       |  $us
       |  FROM mt
       |), vv AS (SELECT *,
       |  $vs
       |  FROM one)
       |SELECT 'view' AS channel,
       |  CAST(${exposed(Seq(1, 3, 5, 7))} AS BIGINT) AS n_exposed,
       |  round(${shap(Seq((1, 0), (3, 2), (5, 4), (7, 6)))}, 6) AS shapley
       |FROM vv
       |UNION ALL SELECT 'click', CAST(${exposed(Seq(2, 3, 6, 7))} AS BIGINT),
       |  round(${shap(Seq((2, 0), (3, 1), (6, 4), (7, 5)))}, 6) FROM vv
       |UNION ALL SELECT 'signup', CAST(${exposed(Seq(4, 5, 6, 7))} AS BIGINT),
       |  round(${shap(Seq((4, 0), (5, 1), (6, 2), (7, 3)))}, 6) FROM vv
       |ORDER BY channel""".stripMargin
  }

  /** q214's oracle unrolls the 8 farthest-point-sampling rounds as a CTE
    * chain: each round picks argmax of the running min-distance (same
    * DESC/vec_id tiebreak as the Spark max(struct)), then folds the new
    * center in with the SAME left-associated `least` the Spark state
    * update applies. Distances use the proven-parity dot-product
    * identities (q30/q210); everything stays unrounded until emission. */
  private def kcenterSql: String = {
    val k = 8
    def dd(a: String, b: String) =
      s"list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b)" +
        s" + list_dot_product($b, $b)"
    def notIn(i: Int) =
      (0 until i).map(j => s"SELECT id FROM p$j").mkString(" UNION ALL ")
    val head =
      s"""WITH ev AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p0 AS (SELECT CAST(0 AS BIGINT) AS id, CAST(NULL AS DOUBLE) AS d2),
         |m0 AS (
         |  SELECT x.vec_id, ${dd("x.v", "c.v")} AS d2min
         |  FROM ev x JOIN ev c ON c.vec_id = (SELECT id FROM p0))""".stripMargin
    val rounds = (1 until k).map { i =>
      val pick =
        s"""p$i AS (
           |  SELECT vec_id AS id, d2min AS d2 FROM m${i - 1}
           |  WHERE vec_id NOT IN (${notIn(i)})
           |  ORDER BY d2min DESC, vec_id LIMIT 1)""".stripMargin
      val upd =
        if (i < k - 1)
          s""",
             |m$i AS (
             |  SELECT m.vec_id, least(m.d2min, ${dd("x.v", "c.v")}) AS d2min
             |  FROM m${i - 1} m JOIN ev x ON x.vec_id = m.vec_id
             |  JOIN ev c ON c.vec_id = (SELECT id FROM p$i))""".stripMargin
        else ""
      ",\n" + pick + upd
    }.mkString
    val sel = (0 until k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS sel_order, id AS vec_id, " +
        s"round(d2, 6) AS d2_sel FROM p$i").mkString("\n  UNION ALL ")
    s"$head$rounds\nSELECT * FROM (\n  $sel\n) ORDER BY sel_order"
  }

  /** q105's oracle replays the JL projection with the SAME inlined plane
    * constants the Spark side constant-folds (LshAnn.hyperplanes seed 7),
    * and spells every double operation in the identical evaluation order:
    * dot products via list_dot_product (the proven-parity spelling from
    * q30/q31/q100), the projected squared distance as the same
    * left-associated 16-term sum the Spark fold produces. */
  private def jlDistortionSql: String = {
    val planes = graft.similarity.LshAnn.hyperplanes(64, 16, seed = 7L)
    val proj = planes.map { p =>
      s"list_dot_product(v, [${p.mkString(", ")}])"
    }.mkString("[", ",\n      ", "]")
    val dp2 = (1 to 16).map(i => s"(pa[$i] - pb[$i]) * (pa[$i] - pb[$i])")
      .mkString(" + ")
    s"""WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |  WHERE vec_id < 40
      |), p AS (
      |  SELECT vec_id, v, $proj AS pr FROM e
      |), pairs AS (
      |  SELECT
      |    list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
      |      - 2.0 * list_dot_product(a.v, b.v) AS d2,
      |    a.pr AS pa, b.pr AS pb
      |  FROM p a JOIN p b ON a.vec_id < b.vec_id
      |), r AS (
      |  SELECT sqrt(($dp2) / 16.0) / sqrt(d2) AS ratio
      |  FROM pairs WHERE d2 > 0
      |), agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    round(CAST(SUM(CAST(ratio AS DECIMAL(27,12))) AS DOUBLE)
      |      / CAST(COUNT(*) AS DOUBLE), 6) AS mean_ratio,
      |    round(MIN(ratio), 6) AS min_ratio,
      |    round(MAX(ratio), 6) AS max_ratio
      |  FROM r)
      |SELECT n_pairs, mean_ratio, min_ratio, max_ratio,
      |  (mean_ratio BETWEEN 0.8 AND 1.2) AND min_ratio > 0.4
      |    AND max_ratio < 1.8 AS jl_ok
      |FROM agg""".stripMargin
  }

  /** Winnowing fingerprint CTE chain over `documents` — Karp-Rabin char
    * 8-gram hashes, window-4 sliding minima, distinct, frequency-capped at
    * 50 — ending in `kept(doc_id, fp)`. The q74 pipeline's candidate side,
    * shared with q88's containment verify. */
  private def winnowKeptCtes: String =
    """codes AS (
      |  SELECT doc_id,
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(unicode(substring(text, CAST(i AS INTEGER), 1)) AS BIGINT)) AS cp
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id,
      |    CASE WHEN len(cp) >= 8 THEN
      |      list_transform(range(1, len(cp) - 6),
      |        i -> list_reduce(list_prepend(CAST(0 AS BIGINT), cp[i:i+7]),
      |               (a, b) -> (a * 131 + b) % 2147483647))
      |    ELSE [] END AS g
      |  FROM codes
      |), winnowed AS (
      |  SELECT doc_id,
      |    CASE WHEN len(g) = 0 THEN []
      |         WHEN len(g) < 4 THEN [list_min(g)]
      |         ELSE list_distinct(list_transform(range(1, len(g) - 2),
      |                i -> list_min(g[i:i+3]))) END AS fps
      |  FROM grams
      |), e AS (
      |  SELECT doc_id, unnest(fps) AS fp FROM winnowed
      |), freq AS (SELECT fp, COUNT(*) AS c FROM e GROUP BY fp),
      |kept AS (SELECT e.doc_id, e.fp FROM e JOIN freq USING (fp) WHERE freq.c <= 50)""".stripMargin

  /** One Lloyd round of the q89 spherical k-means as CTEs `a$i`/`s$i`/
    * `m$i`/`c$i` reading centroids from `prevC`: cosine argmax assignment
    * (ties to smallest centroid id), DECIMAL(27,12) component sums, list
    * rebuild in position order, L2 re-normalization — stage-for-stage the
    * arithmetic of [[graft.similarity.KMeansCosine.fit]]. */
  /** q194's oracle regenerates the same six pairwise Pearson r values from
    * identical exact decimal power sums; the pair loop mirrors the Spark
    * side's index order so the UNION ALL rows land in the same lexical
    * (var_x, var_y) order the final ORDER BY pins anyway. */
  private def corrMatrixSql: String = {
    val vars = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val sel = vars.zipWithIndex.map { case (v, i) =>
      s"CAST(CAST(round($v * 100) AS BIGINT) AS DECIMAL(11,0)) AS x$i"
    }.mkString(",\n    ")
    val sums = vars.indices.map(i => s"SUM(x$i) AS s$i") ++
      vars.indices.flatMap(i => vars.indices.filter(_ >= i).map(j =>
        s"SUM(CAST(x$i AS DECIMAL(19,0)) * x$j) AS p${i}_$j"))
    val rows = vars.indices.flatMap(i => vars.indices.filter(_ > i).map { j =>
      s"""SELECT '${vars(i)}' AS var_x, '${vars(j)}' AS var_y, round(
         |    (CAST(n AS DOUBLE) * CAST(p${i}_$j AS DOUBLE)
         |      - CAST(s$i AS DOUBLE) * CAST(s$j AS DOUBLE)) /
         |    sqrt((CAST(n AS DOUBLE) * CAST(p${i}_$i AS DOUBLE)
         |      - CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE)) *
         |         (CAST(n AS DOUBLE) * CAST(p${j}_$j AS DOUBLE)
         |      - CAST(s$j AS DOUBLE) * CAST(s$j AS DOUBLE))), 6) AS r
         |  FROM s""".stripMargin
    }).mkString("\n  UNION ALL\n  ")
    s"""WITH src AS (
       |  SELECT
       |    $sel
       |  FROM lineitem),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM src)
       |SELECT var_x, var_y, r FROM (
       |  $rows
       |) ORDER BY var_x, var_y""".stripMargin
  }

  /** q205's per-subspace PQ replay: slice → first-4 init → L2 argmin
    * assignment (d² via three dot products, matching the Spark side's
    * evaluation order exactly) → exact-decimal mean update → reassign →
    * per-code population and mean residual. */
  private def pqSubspace(s: Int): String = {
    val lo = s * 16 + 1
    val hi = s * 16 + 16
    s"""xs$s AS (
       |  SELECT vec_id, v[$lo:$hi] AS x FROM ev
       |), c0_$s AS (
       |  SELECT vec_id AS j, x AS c FROM xs$s
       |  QUALIFY row_number() OVER (ORDER BY vec_id) <= 4
       |), a1_$s AS (
       |  SELECT xs$s.vec_id, xs$s.x, c0_$s.j,
       |    list_dot_product(x, x) - 2.0 * list_dot_product(x, c)
       |      + list_dot_product(c, c) AS d2
       |  FROM xs$s CROSS JOIN c0_$s
       |  QUALIFY row_number() OVER (PARTITION BY xs$s.vec_id ORDER BY d2, j) = 1
       |), sub$s AS (
       |  SELECT j, pos, SUM(CAST(xv AS DECIMAL(27,12))) AS sm, COUNT(*) AS n
       |  FROM (SELECT j, unnest(x) AS xv, generate_subscripts(x, 1) AS pos
       |        FROM a1_$s)
       |  GROUP BY j, pos
       |), c1_$s AS (
       |  SELECT j, list(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS c
       |  FROM sub$s GROUP BY j
       |), a2_$s AS (
       |  SELECT xs$s.vec_id, c1_$s.j,
       |    list_dot_product(x, x) - 2.0 * list_dot_product(x, c)
       |      + list_dot_product(c, c) AS d2
       |  FROM xs$s CROSS JOIN c1_$s
       |  QUALIFY row_number() OVER (PARTITION BY xs$s.vec_id ORDER BY d2, j) = 1
       |), res$s AS (
       |  SELECT $s AS sub, j AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       |    round(CAST(SUM(CAST(d2 AS DECIMAL(27,12))) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 6) AS mean_d2
       |  FROM a2_$s GROUP BY 1, 2
       |)""".stripMargin
  }

  /** q207's oracle: one UNION ALL branch per candidate shuffle key, each
    * re-deriving the StableHash bucket ((md5_upper64 mod 2^61−1) mod 32 —
    * the q90-proven portable spelling) and the same fixed-denominator
    * bucket statistics. */
  private def shufflePlannerSql: String = {
    def branch(name: String): String =
      s"""SELECT '$name' AS shuffle_key, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |    CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
         |    CAST(MAX(cnt) AS BIGINT) AS max_bucket_rows,
         |    round(CAST(SUM(cnt) AS DOUBLE) / 32.0, 6) AS mean_bucket_rows,
         |    round(CAST(MAX(cnt) AS DOUBLE)
         |      / (CAST(SUM(cnt) AS DOUBLE) / 32.0), 6) AS skew_ratio
         |  FROM (
         |    SELECT CAST((CAST(md5_number_upper(CAST($name AS VARCHAR)) AS HUGEINT)
         |        % 2305843009213693951) % 32 AS BIGINT) AS b, COUNT(*) AS cnt
         |    FROM lineitem GROUP BY 1)""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(branch)
      .mkString("", "\nUNION ALL\n", "\nORDER BY shuffle_key")
  }

  private def kmeansIter(i: Int, prevC: String): String =
    s"""a$i AS (
      |  SELECT vh.vec_id, vh.v, $prevC.j, list_dot_product(vh.v, $prevC.c) AS cos
      |  FROM vh CROSS JOIN $prevC
      |  QUALIFY row_number() OVER (PARTITION BY vh.vec_id ORDER BY cos DESC, j) = 1
      |), s$i AS (
      |  SELECT j, pos, SUM(CAST(x AS DECIMAL(27,12))) AS s, COUNT(*) AS n
      |  FROM (SELECT j, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM a$i)
      |  GROUP BY j, pos
      |), m$i AS (
      |  SELECT j, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY pos) AS m
      |  FROM s$i GROUP BY j
      |), c$i AS (
      |  SELECT j, list_transform(m, x -> x / sqrt(list_dot_product(m, m))) AS c
      |  FROM m$i
      |)""".stripMargin

  /** Shared CTE chain producing minhash-LSH candidate pairs (`cand`) and
    * shingle sets (`sh`) over `documents` — the q27 pipeline, reused by
    * q54's connected-components oracle. Rendered WITHOUT the leading
    * "WITH " so callers can choose WITH vs WITH RECURSIVE. */
  /** q285's oracle: the SPRT constants are interpolated from the SAME
    * math.log calls the Spark side uses, so both engines walk the path
    * with bit-identical literals. */
  private def sprtSql: String = {
    val k1 = math.log(0.35 / 0.25)
    val k2 = math.log(0.65 / 0.75)
    val bound = math.log(19.0)
    s"""WITH obs AS (
      |  SELECT epoch_us(ts) AS us, event_id,
      |    CASE WHEN value >= 100 THEN 1 ELSE 0 END AS conv
      |  FROM events WHERE event_type = 'purchase'
      |), path AS (
      |  SELECT CAST(row_number() OVER (ORDER BY us, event_id)
      |      AS BIGINT) AS t,
      |    CAST(SUM(conv) OVER (ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conv_t
      |  FROM obs
      |), llrp AS (
      |  SELECT t, conv_t,
      |    $k1 * CAST(conv_t AS DOUBLE)
      |      + $k2 * CAST(t - conv_t AS DOUBLE) AS llr
      |  FROM path
      |), cr AS (
      |  SELECT min(t) AS first_cross_t FROM llrp
      |  WHERE llr >= $bound OR llr <= -($bound)
      |), fin AS (
      |  SELECT max(t) AS n_obs, max(conv_t) AS n_conv FROM llrp
      |)
      |SELECT n_obs, n_conv,
      |  round($k1 * CAST(n_conv AS DOUBLE)
      |    + $k2 * CAST(n_obs - n_conv AS DOUBLE), 6) AS llr_final,
      |  first_cross_t, lp.conv_t AS conv_at_cross,
      |  CASE WHEN first_cross_t IS NULL THEN 'CONTINUE'
      |       WHEN lp.llr >= $bound THEN 'ACCEPT_H1'
      |       ELSE 'ACCEPT_H0' END AS decision
      |FROM fin CROSS JOIN cr
      |LEFT JOIN llrp lp ON lp.t = first_cross_t""".stripMargin
  }

  /** q368 ALS helpers, mirrored textually against the Spark expressions:
    * nano-quantizer floor(x·1e9+0.5) → DECIMAL(18,9), and the per-key
    * closed-form 2×2 ridge solve over exact-decimal normal equations. */
  private def alsQuant(x: String): String =
    s"CAST(CAST(FLOOR(($x) * 1e9 + CAST(0.5 AS DOUBLE)) AS DECIMAL(18,0))" +
      " * 0.000000001 AS DECIMAL(18,9))"

  private def alsSolve(outKey: String, joinKey: String, from: String,
      rel: String = "ratings"): String = {
    val lam = "CAST(0.1 AS DOUBLE)"
    val det = s"((a11 + $lam) * (a22 + $lam) - a12 * a12)"
    s"""SELECT $outKey,
       |    ${alsQuant(s"((a22 + $lam) * b0 - a12 * b1) / $det")} AS f0,
       |    ${alsQuant(s"((a11 + $lam) * b1 - a12 * b0) / $det")} AS f1
       |  FROM (
       |    SELECT rt.$outKey,
       |      CAST(SUM(f.f0 * f.f0) AS DOUBLE) AS a11,
       |      CAST(SUM(f.f0 * f.f1) AS DOUBLE) AS a12,
       |      CAST(SUM(f.f1 * f.f1) AS DOUBLE) AS a22,
       |      CAST(SUM(f.f0 * rt.r) AS DOUBLE) AS b0,
       |      CAST(SUM(f.f1 * rt.r) AS DOUBLE) AS b1
       |    FROM $rel rt JOIN $from f USING ($joinKey)
       |    GROUP BY rt.$outKey)""".stripMargin
  }

  private def alsSse(p: String, q: String, rel: String = "ratings"): String =
    s"""SELECT CAST(SUM(em * em) AS BIGINT) AS sse_m2 FROM (
       |    SELECT CAST(FLOOR(CAST(rt.r - (p.f0 * q.f0 + p.f1 * q.f1) AS DOUBLE)
       |      * CAST(1000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS em
       |    FROM $rel rt JOIN $p p USING (u) JOIN $q q USING (i))""".stripMargin

  /** The q393 frame-sequence replay as shareable CTEs (ends in `vp`, the
    * verified near-dup clip pairs): planted per-frame rasters → integer
    * grayscale → per-frame dHash bits → (frame, band, bkey) keys → cap →
    * candidate pairs → aligned-frame Hamming → the 4/5-close integer
    * threshold. Same per-bit-rows discipline as [[phashPairCtes]]. */
  private def videoPairCtes: String =
    """d AS (
      |  SELECT doc_id, doc_id // 2 AS grp, doc_id % 2 AS p,
      |    12 + (doc_id // 2) % 9 AS w, 12 + (doc_id // 2) % 7 AS h,
      |    4 + (doc_id // 2) % 3 AS nf
      |  FROM documents),
      |dd AS (SELECT d.*, (grp % nf) AS pf FROM d),
      |fr AS (SELECT dd.*, t.f FROM dd, range(6) t(f) WHERE t.f < dd.nf),
      |g AS (SELECT i, j FROM range(9) t1(i), range(8) t2(j)),
      |px AS (
      |  SELECT fr.doc_id, fr.grp, fr.p, fr.pf, fr.f, g.i, g.j,
      |    (g.i * fr.w) // 9 AS x, (g.j * fr.h) // 8 AS y
      |  FROM fr, g),
      |tt AS (
      |  SELECT doc_id, p, pf, f, i, j, x, y,
      |    ((grp * 2654435761 + x * 31 + y * 131 + f * 8191) % 16777213)
      |      * ((grp * 2654435761 + x * 31 + y * 131 + f * 8191) % 16777213)
      |      % 16777213 % 256 AS g0
      |  FROM px),
      |pix AS (
      |  SELECT doc_id, f, i, j,
      |    CASE WHEN p = 1 AND f = pf AND (x + y) % 2 = 0
      |      THEN xor(g0, 1) ELSE g0 END AS gy
      |  FROM tt),
      |fbits AS (
      |  SELECT a.doc_id, a.f, (a.j * 8 + a.i) AS bitpos,
      |    CASE WHEN a.gy > b.gy THEN 1 ELSE 0 END AS bit
      |  FROM pix a JOIN pix b
      |    ON a.doc_id = b.doc_id AND a.f = b.f AND a.j = b.j
      |      AND b.i = a.i + 1
      |  WHERE a.i < 8),
      |fbands AS (
      |  SELECT doc_id, f, bitpos // 16 AS band,
      |    SUM(bit << (bitpos % 16)) AS bkey
      |  FROM fbits GROUP BY 1, 2, 3),
      |fbsz AS (
      |  SELECT f, band, bkey FROM fbands
      |  GROUP BY f, band, bkey HAVING COUNT(*) <= 100),
      |fcapped AS (
      |  SELECT b.* FROM fbands b JOIN fbsz USING (f, band, bkey)),
      |fcand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM fcapped a JOIN fcapped b
      |    ON a.f = b.f AND a.band = b.band AND a.bkey = b.bkey
      |      AND a.doc_id < b.doc_id),
      |hamf AS (
      |  SELECT c.id_a, c.id_b, x.f,
      |    SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hf
      |  FROM fcand c
      |  JOIN fbits x ON x.doc_id = c.id_a
      |  JOIN fbits y ON y.doc_id = c.id_b AND y.f = x.f
      |    AND y.bitpos = x.bitpos
      |  GROUP BY 1, 2, 3),
      |nfr AS (SELECT doc_id, nf FROM dd),
      |vp AS (
      |  SELECT h.id_a, h.id_b,
      |    CAST(SUM(CASE WHEN h.hf <= 6 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_close,
      |    CAST(greatest(na.nf, nb.nf) AS BIGINT) AS n_total
      |  FROM hamf h
      |  JOIN nfr na ON na.doc_id = h.id_a
      |  JOIN nfr nb ON nb.doc_id = h.id_b
      |  GROUP BY h.id_a, h.id_b, na.nf, nb.nf
      |  HAVING SUM(CASE WHEN h.hf <= 6 THEN 1 ELSE 0 END) * 5
      |    >= greatest(na.nf, nb.nf) * 4)""".stripMargin

  /** The q396 trimmed-clip replay as CTEs (ends in `scored`, the
    * per-(pair, shift) verified alignments): the [[videoPairCtes]]
    * arithmetic with the odd twin's head frame trimmed (stored frame `f`
    * replays original frame `o = f + p`) and the retouch at original
    * frame `pf ∈ [1, nf−1]`; candidates on (band, bkey) — frame index
    * off the key — bounded to |Δ| ≤ 2; per-shift aligned-frame Hamming;
    * threshold against `greatest(na, nb) − |Δ|`. The q396 query picks
    * the best alignment with a QUALIFY arg-max on top. */
  private def trimmedVideoPairCtes: String =
    """d AS (
      |  SELECT doc_id, doc_id // 2 AS grp, doc_id % 2 AS p,
      |    12 + (doc_id // 2) % 9 AS w, 12 + (doc_id // 2) % 7 AS h,
      |    4 + (doc_id // 2) % 3 AS nf
      |  FROM documents),
      |dd AS (SELECT d.*, 1 + (grp % (nf - 1)) AS pf FROM d),
      |fr AS (SELECT dd.*, t.f FROM dd, range(6) t(f)
      |  WHERE t.f < dd.nf - dd.p),
      |g AS (SELECT i, j FROM range(9) t1(i), range(8) t2(j)),
      |px AS (
      |  SELECT fr.doc_id, fr.grp, fr.p, fr.pf, fr.f, fr.f + fr.p AS o,
      |    g.i, g.j, (g.i * fr.w) // 9 AS x, (g.j * fr.h) // 8 AS y
      |  FROM fr, g),
      |tt AS (
      |  SELECT doc_id, p, pf, f, o, i, j, x, y,
      |    ((grp * 2654435761 + x * 31 + y * 131 + o * 8191) % 16777213)
      |      * ((grp * 2654435761 + x * 31 + y * 131 + o * 8191) % 16777213)
      |      % 16777213 % 256 AS g0
      |  FROM px),
      |pix AS (
      |  SELECT doc_id, f, i, j,
      |    CASE WHEN p = 1 AND o = pf AND (x + y) % 2 = 0
      |      THEN xor(g0, 1) ELSE g0 END AS gy
      |  FROM tt),
      |fbits AS (
      |  SELECT a.doc_id, a.f, (a.j * 8 + a.i) AS bitpos,
      |    CASE WHEN a.gy > b.gy THEN 1 ELSE 0 END AS bit
      |  FROM pix a JOIN pix b
      |    ON a.doc_id = b.doc_id AND a.f = b.f AND a.j = b.j
      |      AND b.i = a.i + 1
      |  WHERE a.i < 8),
      |fbands AS (
      |  SELECT doc_id, f, bitpos // 16 AS band,
      |    SUM(bit << (bitpos % 16)) AS bkey
      |  FROM fbits GROUP BY 1, 2, 3),
      |fbsz AS (
      |  SELECT band, bkey FROM fbands
      |  GROUP BY band, bkey HAVING COUNT(*) <= 100),
      |fcapped AS (
      |  SELECT b.* FROM fbands b JOIN fbsz USING (band, bkey)),
      |fcand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    b.f - a.f AS shift
      |  FROM fcapped a JOIN fcapped b
      |    ON a.band = b.band AND a.bkey = b.bkey
      |      AND a.doc_id < b.doc_id AND abs(b.f - a.f) <= 2),
      |hamf AS (
      |  SELECT c.id_a, c.id_b, c.shift, x.f,
      |    SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hf
      |  FROM fcand c
      |  JOIN fbits x ON x.doc_id = c.id_a
      |  JOIN fbits y ON y.doc_id = c.id_b AND y.f = x.f + c.shift
      |    AND y.bitpos = x.bitpos
      |  GROUP BY 1, 2, 3, 4),
      |nfr AS (SELECT doc_id, nf - p AS nst FROM dd),
      |scored AS (
      |  SELECT h.id_a, h.id_b, CAST(h.shift AS BIGINT) AS shift,
      |    CAST(SUM(CASE WHEN h.hf <= 6 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_close,
      |    CAST(greatest(na.nst, nb.nst) - abs(h.shift) AS BIGINT)
      |      AS n_total
      |  FROM hamf h
      |  JOIN nfr na ON na.doc_id = h.id_a
      |  JOIN nfr nb ON nb.doc_id = h.id_b
      |  GROUP BY h.id_a, h.id_b, h.shift, na.nst, nb.nst
      |  HAVING SUM(CASE WHEN h.hf <= 6 THEN 1 ELSE 0 END) * 5
      |    >= (greatest(na.nst, nb.nst) - abs(h.shift)) * 4)""".stripMargin

  /** The q382 perceptual-hash replay as shareable CTEs (ends in `ham`):
    * planted pixel arithmetic → integer grayscale → dHash bits → 4×16-bit
    * band keys → candidate pairs → Hamming. The 64-bit hash is kept as
    * per-bit ROWS, never assembled into one BIGINT (bit 63 would overflow
    * a signed shift). */
  private def phashPairCtes: String =
    """d AS (
      |  SELECT doc_id, doc_id // 2 AS grp, doc_id % 2 AS p,
      |    16 + (doc_id // 2) % 17 AS w, 16 + (doc_id // 2) % 13 AS h
      |  FROM documents),
      |g AS (SELECT i, j FROM range(9) t1(i), range(8) t2(j)),
      |px AS (
      |  SELECT d.doc_id, d.grp, d.p, g.i, g.j,
      |    (g.i * d.w) // 9 AS x, (g.j * d.h) // 8 AS y
      |  FROM d, g),
      |tt AS (
      |  SELECT doc_id, p, i, j, x, y,
      |    ((grp * 2654435761 + x * 31 + y * 131) % 16777213)
      |      * ((grp * 2654435761 + x * 31 + y * 131) % 16777213)
      |      % 16777213 AS base
      |  FROM px),
      |pix AS (
      |  SELECT doc_id, i, j,
      |    CASE WHEN p = 1 AND (x + y) % 2 = 0
      |      THEN xor(base, 65793) ELSE base END AS v
      |  FROM tt),
      |gray AS (
      |  SELECT doc_id, i, j,
      |    (((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587
      |      + (v & 255) * 114) // 1000 AS gy
      |  FROM pix),
      |bits AS (
      |  SELECT a.doc_id, (a.j * 8 + a.i) AS bitpos,
      |    CASE WHEN a.gy > b.gy THEN 1 ELSE 0 END AS bit
      |  FROM gray a JOIN gray b
      |    ON a.doc_id = b.doc_id AND a.j = b.j AND b.i = a.i + 1
      |  WHERE a.i < 8),
      |bands AS (
      |  SELECT doc_id, bitpos // 16 AS band,
      |    SUM(bit << (bitpos % 16)) AS bkey
      |  FROM bits GROUP BY 1, 2),
      |bsz AS (
      |  SELECT band, bkey FROM bands
      |  GROUP BY band, bkey HAVING COUNT(*) <= 100),
      |capped AS (
      |  SELECT b.* FROM bands b JOIN bsz USING (band, bkey)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM capped a JOIN capped b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |ham AS (
      |  SELECT c.id_a, c.id_b,
      |    SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS hamming
      |  FROM cand c
      |  JOIN bits x ON x.doc_id = c.id_a
      |  JOIN bits y ON y.doc_id = c.id_b AND y.bitpos = x.bitpos
      |  GROUP BY 1, 2)""".stripMargin

  private def minhashPairCtes: String =
    s"""t AS (
      |  SELECT doc_id, string_split(text, ' ') tk FROM documents
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(tk) >= 3
      |      THEN list_transform(range(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |      ELSE [] END) AS sg
      |  FROM t
      |), hs AS (
      |  SELECT doc_id, sg,
      |    list_transform(sg, g -> CAST(md5_number_upper(g) AS HUGEINT) % 2305843009213693951) AS h1,
      |    list_transform(sg, g -> CAST(md5_number_lower(g) AS HUGEINT) % 2305843009213693951) AS h2
      |  FROM sh
      |), mh AS (
      |  SELECT doc_id, sg,
      |    [ ${(0 until 64).map(p => s"(SELECT CAST(min((z.l1 + $p*z.l2) % 2305843009213693951) AS BIGINT) FROM (SELECT unnest(list_zip(h1, h2), recursive := true)) z(l1, l2))").mkString(",\n      ")} ] AS sig
      |  FROM hs
      |), bands AS (
      |  SELECT doc_id, unnest([
      |    ${(0 until 16).map(bi => s"'$bi|' || ${(0 until 4).map(ri => s"sig[${bi * 4 + ri + 1}]").mkString(" || '|' || ")}").mkString(",\n    ")}
      |  ]) AS band
      |  FROM mh
      |), capped AS (
      |  SELECT doc_id, band FROM bands
      |  QUALIFY count(*) OVER (PARTITION BY band) <= 100
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM capped a JOIN capped b ON a.band = b.band AND a.doc_id < b.doc_id
      |)""".stripMargin

  /** Shared unigram-LM trainer CTEs (q388/q389): normalized words of
    * documents matching `docPred` → frequency-weighted substring masses →
    * seed vocab (all single chars + top-64 multi-char) with
    * round(ln,9)-DECIMAL(20,9) NLL costs. Emits CTEs: norm, tok, words,
    * subs, vocab0, tot, vocab. */
  private def unigramTrainCtes(docPred: String): String =
    s"""norm AS (
      |  SELECT trim(regexp_replace(regexp_replace(lower(text),
      |    '[^\\p{L}\\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')) AS t
      |  FROM documents WHERE $docPred
      |), tok AS (
      |  SELECT unnest(string_split(t, ' ')) AS w FROM norm
      |), words AS MATERIALIZED (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM tok
      |  WHERE length(w) BETWEEN 1 AND 16 GROUP BY w
      |), subs AS (
      |  SELECT substr(w.w, CAST(p.i AS INTEGER), CAST(l.l AS INTEGER))
      |      AS piece,
      |    CAST(SUM(w.freq) AS BIGINT) AS seed_mass
      |  FROM words w,
      |    unnest(generate_series(1, length(w.w))) AS p(i),
      |    unnest(generate_series(1,
      |      least(4, length(w.w) - CAST(p.i AS INTEGER) + 1))) AS l(l)
      |  GROUP BY 1
      |), vocab0 AS (
      |  SELECT piece, seed_mass FROM subs WHERE length(piece) = 1
      |  UNION ALL
      |  SELECT piece, seed_mass FROM (
      |    SELECT piece, seed_mass FROM subs WHERE length(piece) >= 2
      |    ORDER BY seed_mass DESC, piece LIMIT 64)
      |), tot AS (SELECT CAST(SUM(seed_mass) AS BIGINT) AS t FROM vocab0),
      |vocab AS MATERIALIZED (
      |  SELECT piece, seed_mass,
      |    CAST(round(ln(CAST(t.t AS DOUBLE))
      |      - ln(CAST(seed_mass AS DOUBLE)), 9) AS DECIMAL(20,9)) AS cost
      |  FROM vocab0, tot t
      |)""".stripMargin

  /** The Viterbi DP replay over `$words` (w, freq) with `$vocab`
    * (piece, cost): a recursive CTE advancing one position per step,
    * each step appending the lateral (cost, seg) minimum — exact
    * DECIMAL(20,9) folds, lexicographic tie-break, identical to
    * [[graft.text.UnigramLm.viterbi]]'s HOF fold when every single char
    * of every word is in `$vocab` (both callers guarantee it). Emits
    * CTEs: edges, rec, fin (w, freq, seg). */
  /** One Viterbi DP round as CTEs `edges$sfx`/`ea$sfx`/`rec$sfx`/
    * `fin$sfx` — the suffix lets q395 chain three EM rounds in one
    * query. `fin$sfx` carries the best-path cost alongside the
    * segmentation (the corpus-NLL input).
    *
    * The recursion CARRIES each word's full edge list (aggregated once
    * in `ea$sfx`, ≤64 entries per word) instead of re-querying an edges
    * CTE from the per-step LATERAL: a CTE referenced from inside the
    * recursive part is re-evaluated on EVERY iteration, which made the
    * chained q395 re-run round 1's whole DP per round-2 step (and rounds
    * 1+2 per round-3 step) — ~600× blowup; and DuckDB 1.0 silently reads
    * a MATERIALIZED CTE as empty when it is referenced from a recursive
    * LATERAL, so materializing was not the fix. With the list carried,
    * the recursive part references nothing but itself. */
  private def unigramDpCtes(words: String, vocab: String,
                            sfx: String = ""): String =
    s"""edges$sfx AS (
      |  SELECT w.w, CAST(p.i AS INTEGER) - CAST(l.l AS INTEGER) AS j,
      |    CAST(p.i AS INTEGER) AS i, v.piece, v.cost
      |  FROM $words w,
      |    unnest(generate_series(1, length(w.w))) AS p(i),
      |    unnest(generate_series(1, least(4, CAST(p.i AS INTEGER))))
      |      AS l(l)
      |  JOIN $vocab v ON v.piece = substr(w.w,
      |    CAST(p.i AS INTEGER) - CAST(l.l AS INTEGER) + 1,
      |    CAST(l.l AS INTEGER))
      |), ea$sfx AS MATERIALIZED (
      |  SELECT w, list(struct_pack(j := j, i := i, piece := piece,
      |    cost := cost)) AS es
      |  FROM edges$sfx GROUP BY w
      |), rec$sfx AS (
      |  SELECT wd.w, length(wd.w) AS len, 0 AS i,
      |    [CAST(0 AS DECIMAL(20,9))] AS costs, [''] AS segs, ea.es AS es
      |  FROM $words wd JOIN ea$sfx ea USING (w)
      |  UNION ALL
      |  SELECT r.w, r.len, r.i + 1, list_append(r.costs, b.cost),
      |    list_append(r.segs, b.seg), r.es
      |  FROM rec$sfx r,
      |  LATERAL (
      |    SELECT CAST(r.costs[e.j + 1] + e.cost AS DECIMAL(20,9))
      |        AS cost,
      |      CASE WHEN e.j = 0 THEN e.piece
      |           ELSE r.segs[e.j + 1] || '|' || e.piece END AS seg
      |    FROM (SELECT unnest(r.es, recursive := true)) e
      |    WHERE e.i = r.i + 1
      |    ORDER BY 1, 2 LIMIT 1) b
      |  WHERE r.i < r.len
      |), fin$sfx AS MATERIALIZED (
      |  SELECT r.w, wd.freq, r.segs[r.i + 1] AS seg,
      |    r.costs[r.i + 1] AS cost
      |  FROM rec$sfx r JOIN $words wd ON wd.w = r.w AND r.i = r.len
      |)""".stripMargin

  /** q395's M-step as CTEs: EM masses of `fin`'s segmentations + the
    * previous vocab's single-char alphabet floored at mass 1, re-costed
    * over the combined total — mirrors [[graft.text.UnigramLm.mStep]].
    * Emits `em$sfx`, `fl$sfx`, `a$sfx`, `t$sfx`, `$out`. */
  private def unigramMStepCtes(fin: String, prevVocab: String, sfx: String,
                               out: String): String =
    s"""em$sfx AS MATERIALIZED (
      |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS em_mass FROM (
      |    SELECT unnest(string_split(seg, '|')) AS piece, freq FROM $fin)
      |  GROUP BY piece
      |), fl$sfx AS (
      |  SELECT v.piece, CAST(1 AS BIGINT) AS em_mass FROM $prevVocab v
      |  WHERE length(v.piece) = 1
      |    AND v.piece NOT IN (SELECT piece FROM em$sfx)
      |), a$sfx AS MATERIALIZED (
      |  SELECT * FROM em$sfx UNION ALL SELECT * FROM fl$sfx
      |), t$sfx AS (SELECT SUM(em_mass) AS t FROM a$sfx),
      |$out AS MATERIALIZED (
      |  SELECT a.piece, a.em_mass,
      |    CAST(round(ln(CAST(t.t AS DOUBLE)) - ln(CAST(a.em_mass AS DOUBLE)),
      |      9) AS DECIMAL(20,9)) AS cost
      |  FROM a$sfx a, t$sfx t
      |)""".stripMargin
}

