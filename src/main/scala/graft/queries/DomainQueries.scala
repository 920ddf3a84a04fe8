package graft.queries

import java.nio.file.Paths

import graft.QueryDef
import graft.functions.Parsers
import graft.ingest.{PropertiesFrame, SyntheticSuumo}
import graft.transform.{Clean, Geocode, Serve}
import org.apache.spark.sql.functions._

/** The reference-domain operators (SURVEY §2.1-2.3) as graded queries.
  * q19 proves parser parity against DuckDB computing the same semantics;
  * q20/q21 run the scrape→clean→serve lifecycles end-to-end on
  * deterministic synthetic pages (HTML parsing is not SQL-expressible →
  * rows-only check; the golden ScalaTest suites carry the exactness).
  */
object DomainQueries {

  // ---------------------------------------------------------------- q19
  /** F1-F8 golden parse table computed independently in both engines. */
  val q19ParseGolden: QueryDef = QueryDef(
    "q19_parse_golden",
    (s, _) => {
      import s.implicits._
      val rows = Seq(
        (1, "新築", "3階建", "都営浅草線/西馬込駅 歩18分", "東京都渋谷区恵比寿南１", "8万円", "5000円", "30m2", "ワンルーム", "2階"),
        (2, "築１２年", "地下1地上3階建", "都営浅草線/西馬込駅 歩18", "東京都渋谷区恵比寿南1", "8.5万円", "-", "30.5m2", "1K", "2-階"),
        (3, "築12年", "地上3階建", "東京メトロ東西線/行徳駅 車15分(5.1km)", "東京都渋谷区神泉町", ".5万円", "200円", ".8m2", "2DK", "3-5階"),
        (4, "築1年", "11階建", "歩1分", "神奈川県横浜市中区山下町２２", "8.万円", "-", "30.m2", "3LDK", "B1階"),
        (5, "築年", "2階建", "ＪＲ山手線/恵比寿駅 歩22分", "東京都台東区元浅草", "-", "100円", "45.5m2", "4SLDK", "B1-1階"),
        (6, "新築", "9階建", "小田急線/新宿駅 歩5分", "東京都新宿区西新宿２", "12万円", "12000円", "100m2", "2LDK", "B2-B1階"),
        (7, "築40年", "5階建", "東急田園都市線/三軒茶屋駅 歩10分", "東京都世田谷区三軒茶屋１２", "6.3万円", "800円", "22.2m2", "1DK", "1-B1階"),
        (8, "築3年", "4階建", "東急東横線/中目黒駅 歩7分", "東京都目黒区中目黒", "7万円", "3000円", "18m2", "5LDK", "階"))
      rows.toDF("id", "age_s", "floors_s", "walk_s", "addr_s", "man_s",
          "en_s", "area_s", "layout_s", "floor_s")
        .select(
          col("id"),
          Parsers.parseAge(col("age_s")).as("age"),
          Parsers.parseFloors(col("floors_s")).as("floors"),
          Parsers.parseTransportation(col("walk_s")).as("walk_min"),
          Parsers.parseWard(col("addr_s")).as("ward"),
          Parsers.parseDistrict(col("addr_s")).as("district"),
          Parsers.parseMoney(col("man_s"), "万円").as("rent"),
          Parsers.parseMoney(col("en_s"), "円").as("fee"),
          Parsers.parseArea(col("area_s")).as("area"),
          Parsers.parseLayout(col("layout_s")).getField("n_rooms").as("n_rooms"),
          Parsers.parseLayout(col("layout_s")).getField("kitchen").as("kitchen"),
          Parsers.parseFloorRange(col("floor_s")).getField("min_floor").as("min_floor"),
          Parsers.parseFloorRange(col("floor_s")).getField("max_floor").as("max_floor"))
        .orderBy(col("id"))
    },
    Some("""
      WITH raw(id, age_s, floors_s, walk_s, addr_s, man_s, en_s, area_s, layout_s, floor_s) AS (VALUES
        (1, '新築', '3階建', '都営浅草線/西馬込駅 歩18分', '東京都渋谷区恵比寿南１', '8万円', '5000円', '30m2', 'ワンルーム', '2階'),
        (2, '築１２年', '地下1地上3階建', '都営浅草線/西馬込駅 歩18', '東京都渋谷区恵比寿南1', '8.5万円', '-', '30.5m2', '1K', '2-階'),
        (3, '築12年', '地上3階建', '東京メトロ東西線/行徳駅 車15分(5.1km)', '東京都渋谷区神泉町', '.5万円', '200円', '.8m2', '2DK', '3-5階'),
        (4, '築1年', '11階建', '歩1分', '神奈川県横浜市中区山下町２２', '8.万円', '-', '30.m2', '3LDK', 'B1階'),
        (5, '築年', '2階建', 'ＪＲ山手線/恵比寿駅 歩22分', '東京都台東区元浅草', '-', '100円', '45.5m2', '4SLDK', 'B1-1階'),
        (6, '新築', '9階建', '小田急線/新宿駅 歩5分', '東京都新宿区西新宿２', '12万円', '12000円', '100m2', '2LDK', 'B2-B1階'),
        (7, '築40年', '5階建', '東急田園都市線/三軒茶屋駅 歩10分', '東京都世田谷区三軒茶屋１２', '6.3万円', '800円', '22.2m2', '1DK', '1-B1階'),
        (8, '築3年', '4階建', '東急東横線/中目黒駅 歩7分', '東京都目黒区中目黒', '7万円', '3000円', '18m2', '5LDK', '階')),
      n AS (SELECT id,
        translate(age_s, '０１２３４５６７８９', '0123456789') AS age_s,
        translate(floors_s, '０１２３４５６７８９', '0123456789') AS floors_s,
        translate(walk_s, '０１２３４５６７８９', '0123456789') AS walk_s,
        translate(addr_s, '０１２３４５６７８９', '0123456789') AS addr_s,
        translate(man_s, '０１２３４５６７８９', '0123456789') AS man_s,
        translate(en_s, '０１２３４５６７８９', '0123456789') AS en_s,
        translate(area_s, '０１２３４５６７８９', '0123456789') AS area_s,
        translate(layout_s, '０１２３４５６７８９', '0123456789') AS layout_s,
        translate(floor_s, '０１２３４５６７８９', '0123456789') AS floor_s
        FROM raw),
      fr AS (SELECT id,
        NULLIF(regexp_extract(floor_s, '^(B?\d+)-?(B?\d+)?階', 1), '') AS g1,
        NULLIF(regexp_extract(floor_s, '^(B?\d+)-?(B?\d+)?階', 2), '') AS g2
        FROM n),
      fr2 AS (SELECT id, g1, COALESCE(g2, g1) AS g2b FROM fr),
      fr3 AS (SELECT id,
        CASE WHEN g1 IS NULL THEN NULL
             WHEN g1 LIKE 'B%' THEN -CAST(substr(g1, 2) AS BIGINT) + 1
             ELSE CAST(g1 AS BIGINT) END AS f1,
        CASE WHEN g2b IS NULL THEN NULL
             WHEN g2b LIKE 'B%' THEN -CAST(substr(g2b, 2) AS BIGINT) + 1
             ELSE CAST(g2b AS BIGINT) END AS f2
        FROM fr2)
      SELECT n.id,
        CASE WHEN age_s = '新築' THEN 0
             ELSE CAST(NULLIF(regexp_extract(age_s, '^築(\d+)年', 1), '') AS BIGINT) END AS age,
        CAST(NULLIF(regexp_extract(floors_s, '^(地下\d+地上)?(\d+)階建', 2), '') AS BIGINT) AS floors,
        CAST(NULLIF(regexp_extract(walk_s, '^.*歩(\d+)分$', 1), '') AS DOUBLE) AS walk_min,
        NULLIF(regexp_extract(addr_s, '^東京都(.+区)(\D*)', 1), '') AS ward,
        CASE WHEN NULLIF(regexp_extract(addr_s, '^東京都(.+区)(\D*)', 1), '') IS NOT NULL
             THEN regexp_extract(addr_s, '^東京都(.+区)(\D*)', 2) END AS district,
        CASE WHEN man_s = '-' THEN 0
             ELSE CAST(TRUNC(CAST(NULLIF(regexp_extract(man_s, '^(\d*\.?\d+)万円', 1), '') AS DOUBLE) * 10000) AS BIGINT) END AS rent,
        CASE WHEN en_s = '-' THEN 0
             ELSE CAST(TRUNC(CAST(NULLIF(regexp_extract(en_s, '^(\d*\.?\d+)円', 1), '') AS DOUBLE) * 1) AS BIGINT) END AS fee,
        CAST(NULLIF(regexp_extract(area_s, '^(\d*\.?\d+)m2', 1), '') AS DOUBLE) AS area,
        CASE WHEN layout_s = 'ワンルーム' THEN 1
             ELSE CAST(NULLIF(regexp_extract(layout_s, '^(\d+)[SLDK]+', 1), '') AS BIGINT) END AS n_rooms,
        CASE WHEN layout_s = 'ワンルーム' THEN FALSE
             WHEN NULLIF(regexp_extract(layout_s, '^(\d+)[SLDK]+', 1), '') IS NULL THEN NULL
             ELSE contains(layout_s, 'K') END AS kitchen,
        CASE WHEN f1 IS NULL THEN NULL ELSE LEAST(f1, f2) END AS min_floor,
        CASE WHEN f1 IS NULL THEN NULL ELSE GREATEST(f1, f2) END AS max_floor
      FROM n JOIN fr3 ON n.id = fr3.id
      ORDER BY n.id"""),
  )

  // ---------------------------------------------------------------- q20
  /** F11 kanji address key: Spark computes via the UDF; the oracle states
    * the golden expected values (int2kanji is not SQL-expressible).
    */
  val q20KanjiAddress: QueryDef = QueryDef(
    "q20_kanji_address",
    (s, _) => {
      import s.implicits._
      Seq(
        (1, "東京都渋谷区恵比寿南１"), (2, "東京都渋谷区恵比寿南１２"),
        (3, "東京都渋谷区神泉町"), (4, "東京都渋谷区千駄ヶ谷１"),
        (5, "東京都新宿区西新宿２１"), (6, "invalid_address"))
        .toDF("id", "addr")
        .select(col("id"), Parsers.buildAddressKanji(col("addr")).as("join_key"))
        .orderBy(col("id"))
    },
    Some("""
      SELECT * FROM (VALUES
        (1, '東京都渋谷区恵比寿南一丁目'),
        (2, '東京都渋谷区恵比寿南十二丁目'),
        (3, '東京都渋谷区神泉町'),
        (4, '東京都渋谷区千駄ケ谷一丁目'),
        (5, '東京都新宿区西新宿二十一丁目'),
        (6, '')) AS t(id, join_key)
      ORDER BY id"""),
  )

  private def synthPages(n: Int): String = {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_synth_pages")
    SyntheticSuumo.writePages(dir, n).toString
  }

  // ---------------------------------------------------------------- q21
  /** S1+S3+F*+D1-D6: the scrape lifecycle (SURVEY §3.1) on deterministic
    * synthetic pages. Not SQL-expressible → rows-only check; exact
    * field-level assertions live in IngestSpec.
    */
  val q21ScrapePipeline: QueryDef = QueryDef(
    "q21_scrape_pipeline",
    (s, _) => {
      val props = PropertiesFrame.scrape(s, synthPages(6),
        fetchedAt = Some(1.6254e9))
      props.orderBy(col("source_file"), col("source_order"))
        .drop("source_file", "source_order")
        // graded projection only: the driver's rows-only checker hashes
        // via pandas sort_values, which cannot sort an array column —
        // serialize it; the library API keeps the array form
        .withColumn("building_transportation",
          to_json(col("building_transportation")))
    },
    oracle = None,
  )

  // ---------------------------------------------------------------- q22
  /** The geocoded scrape frame's 34 columns (PropertiesFrame.fromRaw's
    * projection + the geocode join's latitude/longitude) — the dropna
    * ("any") clause of the oracle must test exactly these.
    */
  private val q22BaseCols: Seq[String] = Seq(
    "jnc_id", "building_category", "building_title", "building_address",
    "building_transportation", "building_age", "building_floors", "rent",
    "admin_fee", "deposit", "gratuity", "layout", "area", "min_floor",
    "max_floor", "url", "new_arrival", "html_file_banner_timestamp",
    "html_file_last_modified_at", "n_rooms", "service_room", "living_room",
    "dining_room", "kitchen", "n_stations", "walk_time_station_min",
    "walk_time_station_avg", "ward", "district", "html_file_fetched_at",
    "source_file", "source_order", "latitude", "longitude")

  // per-process path: concurrent runs (two Verifys, or bench overlapping
  // verify) must not clobber each other's oracle input; the oracle SQL
  // interpolates the same value, so the DuckDB side reads this run's bytes
  private val q22BasePath =
    s"/tmp/graft_q22_base_${ProcessHandle.current().pid()}.parquet"

  /** The full batch lifecycle: scrape → geocode join (J1) → target (D7) →
    * clean (P1+P2+P3) → stub-model scoring (J2) → serving join/sort
    * (J3/D8/O1/D9). The geocoded frame is materialized to parquet so the
    * DuckDB oracle replays clean → score → serve over the same bits (the
    * scrape/HTML half is not SQL-expressible; its exactness lives in the
    * golden IngestSpec and q19).
    */
  val q22FullPipeline: QueryDef = QueryDef(
    "q22_full_pipeline",
    (s, _) => {
      val csv = SyntheticSuumo.writeLocationCsv(
        Paths.get(System.getProperty("java.io.tmpdir"), "graft_synth_loc"))
      // fetchedAt must be set: clean's dropna treats an all-null
      // html_file_fetched_at as missing data and would drop every row
      val props = PropertiesFrame.scrape(s, synthPages(6),
        fetchedAt = Some(1.6254e9))
      val dim = Geocode.readLocationReference(s, csv.toString)
      Geocode.addAddressCoords(props, dim)
        .write.mode("overwrite").parquet(q22BasePath)
      val base = s.read.parquet(q22BasePath)
      val cleaned = Clean.cleanDf(Clean.addTargetVariable(base))
      // deterministic stub model: ward-mean rent as the prediction
      val pred = cleaned.groupBy(col("ward"))
        .agg(avg(col("y")).as("y_pred_ward"))
      val scored = cleaned
        .join(broadcast(pred), Seq("ward"), "left")
        .select(col("jnc_id"), col("y").cast("double").as("y"),
          col("y_pred_ward").as("y_pred"))
      Serve.joinDataframes(scored, cleaned.drop("y"))
        .select("jnc_id", "monthly_cost", "monthly_cost_predicted",
          "otokuna_score", "building_title", "ward", "district",
          "latitude", "longitude")
    },
    oracle = Some(s"""
      WITH base AS (
        SELECT * FROM read_parquet('$q22BasePath/*.parquet')),
      tgt AS (SELECT *, rent + admin_fee AS y FROM base),
      dedup AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY jnc_id ORDER BY source_file, source_order) AS __rn
          FROM tgt) d
        WHERE __rn = 1),
      -- pandas-inf parity (Clean.removeOutliers): rent = 0 with a
      -- positive fee ranks as +inf (MaxValue sentinel); 0/0 is NaN,
      -- skipped by the quantile and kept by the == filter
      wr AS (
        SELECT *, CASE
          WHEN rent = 0 AND admin_fee > 0 THEN 1.7976931348623157e308
          WHEN rent = 0 THEN NULL
          ELSE CAST(admin_fee AS DOUBLE) / CAST(rent AS DOUBLE) END AS __ratio
        FROM dedup),
      q AS (
        SELECT quantile_cont(CAST(area AS DOUBLE), 0.99) AS q_area,
               quantile_cont(CAST(n_rooms AS DOUBLE), 0.99) AS q_rooms,
               quantile_cont(CAST(building_age AS DOUBLE), 0.99) AS q_age,
               quantile_cont(CAST(rent AS DOUBLE), 0.99) AS q_rent,
               quantile_cont(__ratio, 0.99) AS q_ratio
        FROM wr),
      cleaned AS (
        SELECT wr.* FROM wr, q
        WHERE NOT (COALESCE(CAST(area AS DOUBLE) = q.q_area, false)
          OR COALESCE(CAST(n_rooms AS DOUBLE) = q.q_rooms, false)
          OR COALESCE(CAST(building_age AS DOUBLE) = q.q_age, false)
          OR COALESCE(CAST(rent AS DOUBLE) = q.q_rent, false)
          OR COALESCE(CASE WHEN q.q_ratio >= 1e250
               THEN __ratio = 1.7976931348623157e308
               ELSE __ratio = q.q_ratio END, false))
          AND ${q22BaseCols.map(c => s"$c IS NOT NULL").mkString(" AND ")}),
      pred AS (SELECT ward, avg(y) AS y_pred FROM cleaned GROUP BY ward),
      scored AS (
        SELECT c.jnc_id, CAST(c.y AS DOUBLE) AS y, p.y_pred
        FROM cleaned c LEFT JOIN pred p USING (ward))
      SELECT s.jnc_id, s.y AS monthly_cost,
             s.y_pred AS monthly_cost_predicted,
             s.y_pred / s.y AS otokuna_score,
             c.building_title, c.ward, c.district, c.latitude, c.longitude
      FROM scored s LEFT JOIN cleaned c ON s.jnc_id = c.jnc_id
      ORDER BY otokuna_score DESC, s.jnc_id"""),
  )

  // ---------------------------------------------------------------- q23
  // committed freeze of q23's expected predictions (the q67 pattern
  // applied to training): generated once by running the query itself,
  // committed, and never rewritten — a drift anywhere in the chain
  // (parsers, cleaning, split membership, MLlib split-stat or scoring
  // arithmetic, model format) breaks the hash. Absolute path resolved
  // from the sbt working dir, like MlSpec's fixture load.
  private val q23ExpectedPath =
    new java.io.File("src/test/resources/gbt_expected_predictions")
      .getAbsolutePath

  /** M1-M5: the ML lifecycle as a HARD hash signal — scrape → clean →
    * seeded split → GBT training (absolute loss) → batch score, frozen
    * against a committed expected-predictions parquet. DuckDB cannot
    * train a GBT, so the oracle is the freeze: training runs on the
    * CANONICAL layout (train split sorted on the id, one partition —
    * float split-stat accumulation order is the single
    * layout-dependent degree of freedom, proven bit-deterministic
    * across JVMs by MlSpec's pinned digest), and predictions are
    * milli-quantized so the compare is integer-exact. The early-stop
    * variant (validation set, maxIter=20) stays spec'd in MlSpec M1;
    * per-split MAE accounting is hash-graded by q66.
    */
  val q23MlScore: QueryDef = QueryDef(
    "q23_ml_score",
    (s, _) => {
      val csv = SyntheticSuumo.writeLocationCsv(
        Paths.get(System.getProperty("java.io.tmpdir"), "graft_synth_loc"))
      val props = PropertiesFrame.scrape(s, synthPages(6),
        fetchedAt = Some(1.6254e9))
      val dim = Geocode.readLocationReference(s, csv.toString)
      val cleaned = Clean.cleanDf(Clean.addTargetVariable(
        Geocode.addAddressCoords(props, dim)))
        // provenance columns vary per run (temp dir path, file mtime)
        // and threeWay content-hashes every column — with them in,
        // split MEMBERSHIP itself would drift (MlSpec's freeze
        // documents the same trap)
        .drop("source_file", "html_file_last_modified_at")
        .cache()
      try {
        val splits =
          graft.operators.Splits.threeWay(cleaned, 0.1875, 0.25, 123L)
        val canonical = splits("train").orderBy(col("jnc_id")).coalesce(1)
        val model = graft.ml.Scoring.trainGbt(canonical, maxIter = 10)
        graft.ml.Scoring.predict(model, splits("test"))
          .na.drop(Seq("y_pred"))
          .select(col("jnc_id"),
            (signum(col("y")) * floor(abs(col("y")) * 1000 + lit(0.5)))
              .cast("long").as("y_milli"),
            (signum(col("y_pred")) *
              floor(abs(col("y_pred")) * 1000 + lit(0.5)))
              .cast("long").as("pred_milli"))
          .orderBy(col("jnc_id"))
      } finally cleaned.unpersist() // don't pin blocks for later queries
    },
    oracle = Some(s"""
      SELECT jnc_id, y_milli, pred_milli
      FROM read_parquet('$q23ExpectedPath/*.parquet')
      ORDER BY jnc_id"""),
  )

  // ---------------------------------------------------------------- q24
  /** Scrape THROUGHPUT at reference shape: ~198 rooms/page (50 buildings
    * × 4 rooms, the reference's observed fan-out) at a page count scaled
    * by SF. The reference scrapes one day's 92 MB dump in ~3.6 min
    * single-threaded (BASELINE.md); this is the direct head-to-head.
    * Rows-only check (HTML parse has no SQL oracle; exactness lives in
    * IngestSpec).
    */
  val q24ScrapeBench: QueryDef = QueryDef(
    "q24_scrape_bench",
    (s, dir) => {
      // page count scales with the sf encoded in the dir basename
      // (sfX → ~X*1500 pages, floor 3); unknown layouts get bench scale
      val sf = "sf([0-9.]+)".r.findFirstMatchIn(
        new java.io.File(dir).getName).map(_.group(1).toDouble)
      val nPages = sf.map(v => math.max(3, (v * 1500).toInt)).getOrElse(150)
      val pages = SyntheticSuumo.writePages(
        Paths.get(System.getProperty("java.io.tmpdir"), "graft_bench_pages"),
        nPages, buildingsPerPage = 50, roomsPerBuilding = 4)
      PropertiesFrame.scrape(s, pages.toString, fetchedAt = Some(1.6254e9))
        .drop("source_file", "source_order")
        // serialized for the driver's pandas checker (see q21)
        .withColumn("building_transportation",
          to_json(col("building_transportation")))
    },
    oracle = None,
    headline = true,
  )

  // ---------------------------------------------------------------- q47
  private val q47JobsPath =
    s"/tmp/graft_q47_jobs_${ProcessHandle.current().pid()}.json"

  /** K5+O3 job-info lifecycle (svc/save_job_info.py:18-36 writes
    * job_info.json; app/app.py:313-322 lists, parses, and sorts by
    * (timestamp, user_id)): a deterministic job frame derived from
    * orders goes through the JSON sink, is read back, and sorted. The
    * oracle replays parse + sort over the same JSON bytes in DuckDB,
    * proving the round-trip — timestamps deliberately collide so the
    * user_id tiebreak is exercised.
    */
  val q47JobInfo: QueryDef = QueryDef(
    "q47_job_info",
    (s, dir) => {
      val jobs = graft.Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(
          concat(lit("job_"), col("o_orderkey")).as("job_id"),
          (col("o_orderkey") % 7).cast("double").as("timestamp"),
          concat(lit("u"), col("o_custkey")).as("user_id"),
          concat(lit("https://suumo.jp/jj/?page="), col("o_orderkey"))
            .as("search_url"),
          col("o_orderpriority").as("search_conditions"),
          concat(lit("raw/"), col("o_orderkey"), lit(".zip"))
            .as("raw_data_key"),
          concat(lit("scraped/"), col("o_orderkey"), lit(".pickle"))
            .as("scraped_data_key"),
          concat(lit("prediction/"), col("o_orderkey"), lit(".pickle"))
            .as("prediction_data_key"))
      graft.sources.Sinks.writeJson(jobs, q47JobsPath)
      val schema = "job_id string, timestamp double, user_id string, " +
        "search_url string, search_conditions string, raw_data_key string, " +
        "scraped_data_key string, prediction_data_key string"
      graft.transform.AppServe.sortJobs(
        s.read.schema(schema).json(q47JobsPath))
    },
    oracle = Some(s"""
      SELECT job_id, CAST(timestamp AS DOUBLE) AS timestamp, user_id,
             search_url, search_conditions, raw_data_key,
             scraped_data_key, prediction_data_key
      FROM read_json_auto('$q47JobsPath/*.json',
        format='newline_delimited')
      ORDER BY timestamp, user_id, job_id"""),
  )

  // ---------------------------------------------------------------- q66
  // per-process path (see q22BasePath for why)
  private val q66SplitsPath =
    s"/tmp/graft_q66_splits_${ProcessHandle.current().pid()}.parquet"

  /** M2/M5 oracle anchor — the deterministic slice of the ML lifecycle
    * that q23's GBT run can't hash-check (no GBT in DuckDB). The seeded
    * three-way split assignment is materialized to parquet (membership
    * is Spark-side xxhash64 ranking; the exact SIZE contract is q18's
    * oracle), then everything a model evaluation does deterministically
    * is replayed by DuckDB over the same bytes:
    *
    *  - "train" a stub model on the train split's non-null feature rows
    *    (per-priority mean price in exact cents — the CatBoost
    *    stand-in; reference ml/train.py:40-54 fits on X_train only);
    *  - batch-score through a LEFT re-join onto the PRE-dropna frame,
    *    so rows whose features were dropped keep a NULL prediction
    *    (reference svc/predict.py:42-44: `df[["y"]].join(y_pred,
    *    how="left")`) — n_total vs n_scored is that row accounting;
    *  - per-split MAE (reference ml/train.py:56-64 evaluates each of
    *    train/val/test).
    *
    * Every error term is an integer (cents; predictions go through
    * exact integer division) and the final MAE is a single division of
    * two exact integers — IEEE-exactly-rounded identically in both
    * engines — so the hash compare is drift-free by construction.
    */
  val q66MlEval: QueryDef = QueryDef(
    "q66_ml_eval",
    (s, dir) => {
      val base = graft.Tables(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        (col("o_totalprice") * 100).cast("long").as("y_cents"),
        // deterministic missing-feature rows exercise the dropna →
        // re-join accounting (no RNG: membership must be replayable)
        when(col("o_orderkey") % 97 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("feat"))
      val splits = graft.operators.Splits.threeWay(base, 0.1875, 0.25, 123L)
      splits.toSeq
        .map { case (name, df) => df.withColumn("split", lit(name)) }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(q66SplitsPath)
      val frame = s.read.parquet(q66SplitsPath)
      val model = frame
        .filter(col("split") === "train" && col("feat").isNotNull)
        .groupBy("feat")
        .agg(sum("y_cents").as("s"), count(lit(1)).as("c"))
      val scored = frame.join(broadcast(model), Seq("feat"), "left")
        .withColumn("pred_cents", expr("s DIV c"))
      scored.groupBy("split").agg(
          count(lit(1)).as("n_total"),
          count(col("pred_cents")).as("n_scored"),
          coalesce(sum(abs(col("y_cents") - col("pred_cents"))), lit(0L))
            .as("sum_abs_err"),
          (sum(abs(col("y_cents") - col("pred_cents"))).cast("double") /
            count(col("pred_cents"))).as("mae_cents"))
        .orderBy("split")
    },
    oracle = Some(s"""
      WITH frame AS (
        SELECT * FROM read_parquet('$q66SplitsPath/*.parquet')),
      model AS (
        SELECT feat, sum(y_cents) AS s, count(*) AS c
        FROM frame WHERE split = 'train' AND feat IS NOT NULL
        GROUP BY feat),
      scored AS (
        SELECT f.split, f.y_cents, m.s // m.c AS pred_cents
        FROM frame f LEFT JOIN model m ON f.feat = m.feat)
      SELECT split,
             count(*) AS n_total,
             count(pred_cents) AS n_scored,
             CAST(COALESCE(sum(abs(y_cents - pred_cents)), 0) AS BIGINT)
               AS sum_abs_err,
             CAST(sum(abs(y_cents - pred_cents)) AS DOUBLE)
               / count(pred_cents) AS mae_cents
      FROM scored GROUP BY split ORDER BY split"""),
  )

  // ---------------------------------------------------------------- q67
  // per-process path (see q22BasePath for why)
  private val q67ExpectedPath =
    s"/tmp/graft_q67_expected_${ProcessHandle.current().pid()}.parquet"

  /** Structural oracle for the scrape fan-out (S1-S4) — promotes the
    * parse pipeline from q21's rows-only check to a hard hash signal.
    * [[SyntheticSuumo.expectedRooms]] predicts every surviving room's
    * parsed fields from the generator's arithmetic alone (no HTML, no
    * Catalyst parsers); the Spark side runs the real binaryFile scan →
    * extract → parse pipeline over the rendered pages. The two sides
    * derive the same rows independently, so the driver's hash compare
    * checks row fan-out, the two row-skip sites, and every field parser
    * at once.
    */
  val q67ParseOracle: QueryDef = QueryDef(
    "q67_parse_oracle",
    (s, _) => {
      s.createDataFrame(SyntheticSuumo.expectedRooms(6))
        .write.mode("overwrite").parquet(q67ExpectedPath)
      val props = PropertiesFrame.scrape(s, synthPages(6),
        fetchedAt = Some(1.6254e9))
      props.select(
          regexp_extract(col("source_file"), "([^/]+)$", 1).as("page"),
          col("jnc_id"), col("building_category"), col("building_title"),
          col("building_address"), col("building_age"),
          col("building_floors"), col("rent"), col("admin_fee"),
          col("deposit"), col("gratuity"), col("layout"), col("area"),
          col("min_floor"), col("max_floor"), col("url"),
          col("new_arrival"), col("n_rooms"), col("service_room"),
          col("living_room"), col("dining_room"), col("kitchen"),
          col("n_stations"), col("walk_time_station_min"),
          col("walk_time_station_avg"), col("ward"), col("district"),
          col("html_file_banner_timestamp"))
        .orderBy(col("page"), col("jnc_id"))
    },
    oracle = Some(s"""
      SELECT page, jnc_id, building_category, building_title,
             building_address, building_age, building_floors, rent,
             admin_fee, deposit, gratuity, layout, area, min_floor,
             max_floor, url, new_arrival, n_rooms, service_room,
             living_room, dining_room, kitchen, n_stations,
             walk_time_station_min, walk_time_station_avg, ward,
             district, html_file_banner_timestamp
      FROM read_parquet('$q67ExpectedPath/*.parquet')
      ORDER BY page, jnc_id"""),
  )

  /** Sorted .html page paths under dir — shared by the q237/q241
    * sink-parity fixtures. Closes the Files.list stream (its javadoc
    * requires it; leaking one per invocation accumulates descriptors
    * across warm+min-of-N bench loops).
    */
  private def listHtmlPages(dir: String): Vector[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.list(Paths.get(dir))
    try stream.iterator().asScala.toVector
      .filter(_.toString.endsWith(".html"))
      .sortBy(_.getFileName.toString)
    finally stream.close()
  }

  // --------------------------------------------------------------- q237
  // per-process paths (see q22BasePath for why)
  private val q237ExpectedPath =
    s"/tmp/graft_q237_expected_${ProcessHandle.current().pid()}.parquet"

  /** Equivalence oracle for the S2 zip-member scan (round 13 — the one
    * §2 source that was spec-only): the SAME rendered synthetic pages
    * are ingested twice, once through the S1 directory scan and once
    * repacked into a zip through the K4 sink and read back through the
    * S2 zip-member scan. The dir-side result is written as the
    * expected parquet; the zip-side result is the graded frame — the
    * driver's hash compare then proves member enumeration, content
    * decode, fan-out, and mtime flow agree between the two sources.
    * Entry mtimes are graded at the zip container's documented 2 s
    * resolution (DOS time, see [[graft.sources.Sinks.writeZip]]):
    * both sides floor to 2 s, so the compare is exact, not lenient —
    * a dropped or mis-decoded member, a wrong entry time, or a
    * different surviving-row set still fails.
    */
  val q237ZipParity: QueryDef = QueryDef(
    "q237_zip_parity",
    (s, _) => {
      val pagesDir = synthPages(6)
      val zipPath = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_q237_${ProcessHandle.current().pid()}.zip")
      val files = listHtmlPages(pagesDir)
        .map(p => (p.getFileName.toString,
          java.nio.file.Files.readAllBytes(p),
          // whole seconds by rint, matching the S1 dir reader's mtime
          // rounding — truncation here would skew odd sub-second
          // mtimes one second below the dir side
          math.rint(java.nio.file.Files.getLastModifiedTime(p)
            .toMillis / 1000.0).toLong))
      graft.sources.Sinks.writeZip(files, zipPath)
      def graded(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("page",
          regexp_extract(col("source_file"), "([^/]+)$", 1))
        .withColumn("mtime_2s",
          (floor(col("html_file_last_modified_at") / 2) * 2).cast("double"))
        .withColumn("building_transportation",
          to_json(col("building_transportation")))
        .drop("source_file", "source_order", "html_file_last_modified_at")
        .orderBy(col("page"), col("jnc_id"))
      graded(PropertiesFrame.scrape(s, pagesDir, fetchedAt = Some(1.6254e9)))
        .write.mode("overwrite").parquet(q237ExpectedPath)
      graded(PropertiesFrame.scrape(s, zipPath.toString,
        fetchedAt = Some(1.6254e9)))
    },
    oracle = Some(s"""
      SELECT * FROM read_parquet('$q237ExpectedPath/*.parquet')
      ORDER BY page, jnc_id"""),
  )

  // --------------------------------------------------------------- q239
  /** F15 (JST formatting, app/app.py:47-50) graded by oracle — was the
    * cheapest remaining spec-only §2 entry (round 14, verdict). The
    * Spark side runs the REAL serving function
    * ([[graft.transform.AppServe.formatJst]]: epoch →
    * from_utc_timestamp Asia/Tokyo → yyyy-MM-dd HH:mm:ss); the DuckDB
    * oracle recomputes it as fixed +9 h arithmetic, which is exact for
    * every instant after 1951 (Japan abolished DST), so a tz-database
    * regression, a truncation-vs-round drift, or a format change all
    * hash-mismatch.
    */
  val q239JstFormat: QueryDef = QueryDef(
    "q239_jst_format",
    (s, dir) =>
      graft.Tables(s, dir, "events")
        .select(col("event_id"), unix_timestamp(col("ts")).as("epoch"))
        .withColumn("jst", graft.transform.AppServe.formatJst(col("epoch")))
        .orderBy(col("event_id")),
    oracle = Some("""
      SELECT event_id,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch,
        strftime(date_trunc('second', ts) + INTERVAL 9 HOUR,
                 '%Y-%m-%d %H:%M:%S') AS jst
      FROM events ORDER BY event_id"""),
  )

  // --------------------------------------------------------------- q240
  /** F13 (URL query-param algebra, dumping.py:67-99) graded by oracle
    * (round 14, verdict): five URL shapes are built from `orders` rows
    * — no query string, page-only, set-in-middle, replace-in-place
    * before another key, and a multi-valued key — then pushed through
    * the REAL remove_params + add_params composition
    * ([[graft.ingest.Dumping.removePageParam]] →
    * [[graft.ingest.Dumping.addResultsPerPageParam]]) on executors via
    * a typed map. The oracle states the expected output string per
    * shape, so in-place replacement order, append-at-end for new keys,
    * removal, and multi-value preservation are each hash-graded.
    * Driver-utility surface: a per-row string rewrite, embarrassingly
    * parallel, no shuffle.
    */
  val q240UrlParams: QueryDef = QueryDef(
    "q240_url_params",
    (s, dir) => {
      import s.implicits._
      val base = "https://suumo.jp/search"
      val urls = graft.Tables(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"))
        .select(col("k"), concat(lit(base),
          when(col("k") % 5 === 0, lit(""))
            .when(col("k") % 5 === 1, concat(lit("?page="), col("k") % 7))
            .when(col("k") % 5 === 2, concat(lit("?ts="), col("st"),
              lit("&page="), col("k") % 7, lit("&pc="), col("k") % 3))
            .when(col("k") % 5 === 3, concat(lit("?pc="), col("k") % 3,
              lit("&ts="), col("st")))
            .otherwise(concat(lit("?ts="), col("st"), lit("&ts=Z&page="),
              col("k") % 7))).as("url_in"))
      urls.as[(Long, String)]
        .map { case (k, u) =>
          (k, u, graft.ingest.Dumping.addResultsPerPageParam(
            graft.ingest.Dumping.removePageParam(u)))
        }
        .toDF("k", "url_in", "url_out")
        .orderBy(col("k"))
    },
    oracle = Some("""
      WITH o AS (
        SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS st,
               CAST(o_orderkey % 7 AS BIGINT) AS pg,
               CAST(o_orderkey % 3 AS BIGINT) AS pc
        FROM orders)
      SELECT k,
        CASE CAST(k % 5 AS INT)
          WHEN 0 THEN 'https://suumo.jp/search'
          WHEN 1 THEN 'https://suumo.jp/search?page=' || pg
          WHEN 2 THEN 'https://suumo.jp/search?ts=' || st || '&page=' || pg || '&pc=' || pc
          WHEN 3 THEN 'https://suumo.jp/search?pc=' || pc || '&ts=' || st
          ELSE 'https://suumo.jp/search?ts=' || st || '&ts=Z&page=' || pg
        END AS url_in,
        CASE CAST(k % 5 AS INT)
          WHEN 0 THEN 'https://suumo.jp/search?pc=50'
          WHEN 1 THEN 'https://suumo.jp/search?pc=50'
          WHEN 2 THEN 'https://suumo.jp/search?ts=' || st || '&pc=50'
          WHEN 3 THEN 'https://suumo.jp/search?pc=50&ts=' || st
          ELSE 'https://suumo.jp/search?ts=' || st || '&ts=Z&pc=50'
        END AS url_out
      FROM o ORDER BY k"""),
  )

  // --------------------------------------------------------------- q241
  // per-process path (see q22BasePath for why)
  private val q241ExpectedPath =
    s"/tmp/graft_q241_expected_${ProcessHandle.current().pid()}.parquet"

  /** Equivalence oracle for the K3 HTML-page sink (round 14 — the last
    * sink without a hash signal): the rendered synthetic pages are
    * re-emitted through the REAL [[graft.sources.Sinks.writeHtmlPages]]
    * (one file per page, page_%06d.html naming, dumping.py:223-226) and
    * the sink's output directory is scraped back through the S1/S3
    * pipeline; the SAME pages scraped from their original directory —
    * filenames remapped to the sink's page numbering — are written as
    * the expected parquet. The driver's hash compare then proves the
    * sink preserves page count, numbering order, and byte content (a
    * dropped page, a mangled encoding, or a mis-numbered file all
    * fail). Fresh files get fresh mtimes, so the mtime column is
    * excluded here — q237's zip flow grades the mtime-preserving sink.
    */
  val q241HtmlSinkParity: QueryDef = QueryDef(
    "q241_html_sink_parity",
    (s, _) => {
      import s.implicits._
      val pagesDir = synthPages(6)
      // a FRESH temp dir per call: a fixed pid-keyed path could hold
      // stale extra pages from a previous process after pid reuse —
      // writeHtmlPages overwrites but never deletes, and the re-scrape
      // reads the whole directory
      val outDir = java.nio.file.Files.createTempDirectory("graft_q241_sink_")
      val files = listHtmlPages(pagesDir)
      // 1-based sink numbering over the 0-based fixture names: the
      // remap is deliberately NOT the identity, so a sink that echoed
      // input filenames instead of numbering pages would fail
      graft.sources.Sinks.writeHtmlPages(
        files.zipWithIndex.map { case (p, i) =>
          (i + 1, java.nio.file.Files.readString(p)) }, outDir)
      // the returned plan lazily re-scrapes outDir, so an eager delete
      // would break the caller's execution; deleteOnExit reclaims the
      // per-call dirs a warm bench loop would otherwise accumulate for
      // the life of the machine (r14 advisor). Dir registered FIRST —
      // deleteOnExit runs in reverse registration order, so the files
      // go before their directory.
      outDir.toFile.deleteOnExit()
      listHtmlPages(outDir.toString).foreach(_.toFile.deleteOnExit())
      val nameMap = files.zipWithIndex.map { case (p, i) =>
          (p.getFileName.toString, f"page_${i + 1}%06d.html") }
        .toDF("fname", "page")
      def graded(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("fname",
          regexp_extract(col("source_file"), "([^/]+)$", 1))
        .withColumn("building_transportation",
          to_json(col("building_transportation")))
        .drop("source_file", "source_order", "html_file_last_modified_at")
      graded(PropertiesFrame.scrape(s, pagesDir, fetchedAt = Some(1.6254e9)))
        .join(broadcast(nameMap), Seq("fname")).drop("fname")
        .orderBy(col("page"), col("jnc_id"))
        .write.mode("overwrite").parquet(q241ExpectedPath)
      graded(PropertiesFrame.scrape(s, outDir.toString,
          fetchedAt = Some(1.6254e9)))
        .withColumnRenamed("fname", "page")
        .orderBy(col("page"), col("jnc_id"))
    },
    oracle = Some(s"""
      SELECT * FROM read_parquet('$q241ExpectedPath/*.parquet')
      ORDER BY page, jnc_id"""),
  )

  // --------------------------------------------------------------- q242
  /** A4 (max absolute percentage error, ml/check_onnx.py:33-37) graded
    * by oracle (round 14): the REAL [[graft.ml.Scoring.maxApeFrame]]
    * runs over a deterministic prediction pair derived from lineitem
    * (a = extended price, b = discounted price — the q12 pattern) and
    * DuckDB recomputes the identical IEEE-754 expression. Per-row sub/
    * div/abs on doubles and an order-independent MAX are bit-exact
    * across engines, so the compare needs no rounding; n rides along
    * so an empty relation can't vacuously pass.
    */
  val q242MaxApe: QueryDef = QueryDef(
    "q242_max_ape",
    (s, dir) => {
      val pairs = graft.Tables(s, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("a"),
          (col("l_extendedprice").cast("double") *
            (lit(1.0) - col("l_discount").cast("double"))).as("b"))
      graft.ml.Scoring.maxApeFrame(pairs, "a", "b")
    },
    oracle = Some("""
      SELECT MAX(ABS((a - a * (1.0 - d)) / a)) AS max_ape,
             COUNT(*) AS n
      FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS a,
                   CAST(l_discount AS DOUBLE) AS d
            FROM lineitem)"""),
  )

  // --------------------------------------------------------------- q243
  /** J4 + P5/X3 (condition-code lookup and request validation,
    * dumping.py:33-63) graded by oracle (round 14): a condition-page
    * HTML is rendered from the `nation` table (one checkbox + label per
    * nation, code C<key>), and the REAL
    * [[graft.ingest.Dumping.conditionCodesByValue]] (checkbox→label
    * pairing through the HTML parser) and
    * [[graft.ingest.Dumping.buildConditionCodes]] (requested-value
    * validation + selection; the even-keyed nations are requested) run
    * against it. The oracle restates the expected (value, code,
    * selected) rows from `nation` directly, so a mis-paired label, a
    * dropped checkbox, or a wrong selection all hash-mismatch. The
    * reject path (a requested value with no checkbox throws) stays
    * spec-covered — DumpingSpec. Driver-side utility by design, like
    * the reference: the condition page is ONE fetched document (the
    * 25-row collect is the bounded input, not a data path).
    */
  val q243ConditionCodes: QueryDef = QueryDef(
    "q243_condition_codes",
    (s, dir) => {
      import s.implicits._
      val nations = graft.Tables(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val html = nations.map { case (k, name) =>
        s"""<input type="checkbox" name="ts" id="id$k" value="C$k">""" +
          s"""<label for="id$k">$name</label>"""
      }.mkString("<html><body>", "\n", "</body></html>")
      val byValue = graft.ingest.Dumping.conditionCodesByValue(html, "ts")
      val requested = nations.filter(_._1 % 2 == 0).map(_._2).toSeq
      val selected = graft.ingest.Dumping
        .buildConditionCodes(html, Some(requested), None, None)("ts").toSet
      nations.toSeq.map { case (k, name) =>
          (name, byValue(name), selected.contains(s"C$k")) }
        .toDF("value", "code", "selected")
        .orderBy(col("code"))
    },
    oracle = Some("""
      SELECT n_name AS value,
             'C' || CAST(CAST(n_nationkey AS BIGINT) AS VARCHAR) AS code,
             (CAST(n_nationkey AS BIGINT) % 2 = 0) AS selected
      FROM nation ORDER BY code"""),
  )

  // --------------------------------------------------------------- q244
  /** A6 (pagination scraping, dumping.py:141-167) graded by oracle
    * (round 14): per `orders` row a pager fragment with k = key%7+1
    * pages is rendered on executors — the multi-page shape (numbered
    * links + a 次へ anchor) and the single-page shape (one non-link
    * item, the structure scrape_number_of_pages requires) — and the
    * REAL [[graft.ingest.Dumping.scrapeNumberOfPages]] /
    * [[graft.ingest.Dumping.scrapeNextPageUrl]] parse it back. The
    * oracle restates k and the next-page URL arithmetic, so the
    * last-link extraction, the single-page fallback, and the
    * 次へ-anchor resolution are each hash-graded. Per-row string
    * parse, embarrassingly parallel, no shuffle.
    */
  val q244PaginationScrape: QueryDef = QueryDef(
    "q244_pagination_scrape",
    (s, dir) => {
      import s.implicits._
      graft.Tables(s, dir, "orders")
        .select(col("o_orderkey").cast("long").as("k")).as[Long]
        .map { k =>
          val n = (k % 7 + 1).toInt
          val html =
            if (n == 1)
              """<div class="pagination pagination_set-nav">""" +
                """<ol class="pagination-parts"><li>1</li></ol></div>"""
            else {
              val lis = (1 to n).map(i =>
                s"""<li><a href="/p?page=$i">$i</a></li>""").mkString
              s"""<div class="pagination pagination_set-nav">""" +
                s"""<ol class="pagination-parts">$lis</ol>""" +
                """<ul><li><a href="/p?page=2">次へ</a></li></ul></div>"""
            }
          (k, graft.ingest.Dumping.scrapeNumberOfPages(html),
            graft.ingest.Dumping.scrapeNextPageUrl(html).orNull)
        }
        .toDF("k", "n_pages", "next_url")
        .orderBy(col("k"))
    },
    oracle = Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_orderkey % 7 + 1 AS INT) AS n_pages,
             CASE WHEN o_orderkey % 7 + 1 > 1
                  THEN 'https://suumo.jp/p?page=2' END AS next_url
      FROM orders ORDER BY k"""),
  )

  val all: Seq[QueryDef] =
    Seq(q19ParseGolden, q20KanjiAddress, q21ScrapePipeline, q22FullPipeline,
      q23MlScore, q24ScrapeBench, q47JobInfo, q66MlEval, q67ParseOracle,
      q237ZipParity, q239JstFormat, q240UrlParams, q241HtmlSinkParity,
      q242MaxApe, q243ConditionCodes, q244PaginationScrape)
}
