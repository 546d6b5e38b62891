package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Distributed battlelog extraction — the engine-side shape of the
  * reference's N+1 sequential HTTP loop (cr_client.py:51-61,
  * battles.py:20-44, etl:243-245, SURVEY S2/S3).
  *
  * The reference fetches 1,000 battlelogs one request at a time on a
  * single thread; here the player list is a Dataset and the fetch fans out
  * `mapPartitions`-style: one client per task (connection reuse), players
  * partitioned across executors, results landing as raw JSON lines that
  * [[Tables.battleSchema]] parses in the same pass — the only shape that
  * scales the extract to millions of players.
  *
  * The HTTP transport is pluggable; [[Fetcher.http]] is a plain
  * `java.net.http` client (untestable here — the environment has no
  * egress), and tests inject a deterministic stub.
  */
object BattlelogFetch {

  /** One player-tag → the player's battlelog as raw JSON array text (the
    * API's response body), or None on a non-200/exhausted-retry. */
  trait Fetcher extends Serializable {
    def fetch(playerTag: String): Option[String]
  }

  object Fetcher {
    /** Real transport: bearer-token GET, #-encoded tag path, bounded
      * retries — mirrors the reference client's contract
      * (cr_client.py:15-46: auth header, 10 s timeout, non-200 → error;
      * battles.py:35: `#` → `%23`).
      *
      * Retry policy: only 5xx and 429 are retryable — a 4xx (403 bad
      * token, 404 unknown tag) can never succeed on replay and fails
      * immediately. Retries back off (baseBackoffMs·2^attempt), and a 429
      * honors the server's `Retry-After` seconds when present, so the
      * fan-out never amplifies the throttling it just triggered. */
    def http(baseUrl: String, token: String, timeoutMs: Int = 10000,
        maxRetries: Int = 2, baseBackoffMs: Long = 500L): Fetcher = new Fetcher {
      @transient private lazy val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
      def fetch(tag: String): Option[String] = {
        val url = s"$baseUrl/players/${tag.replaceFirst("#", "%23")}/battlelog"
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("Authorization", s"Bearer $token").GET().build()
        def backoff(attempt: Int, retryAfterSec: Option[Long]): Unit = {
          val ms = retryAfterSec.map(_ * 1000L)
            .getOrElse(baseBackoffMs << (maxRetries - attempt))
          try Thread.sleep(ms) catch { case _: InterruptedException =>
            Thread.currentThread().interrupt() }
        }
        def attempt(left: Int): Option[String] =
          try {
            val resp = client.send(req,
              java.net.http.HttpResponse.BodyHandlers.ofString())
            resp.statusCode() match {
              case 200 => Some(resp.body())
              case 429 if left > 0 =>
                backoff(left, resp.headers().firstValue("Retry-After")
                  .map[Option[Long]](v => v.toLongOption).orElse(None))
                attempt(left - 1)
              case s if s >= 500 && left > 0 =>
                backoff(left, None); attempt(left - 1)
              case _ => None // 4xx (and exhausted retries): terminal
            }
          } catch {
            case _: java.io.IOException if left > 0 =>
              backoff(left, None); attempt(left - 1)
            case _: java.io.IOException => None
          }
        attempt(maxRetries)
      }
    }
  }

  /** Fan the fetch out over the player set and parse to battle rows.
    * Each battlelog is a JSON array; it is exploded to one JSON object
    * per line so `spark.read.json` with the explicit schema never
    * runs inference (SURVEY S2 mapping). Failed fetches drop out —
    * at scale you count them via the returned (tag, ok) side output
    * rather than failing the job. */
  def fetchBattles(spark: SparkSession, playerTags: Dataset[String],
      fetcher: Fetcher): DataFrame = {
    import spark.implicits._
    val jsonLines: Dataset[String] = playerTags.mapPartitions { tags =>
      // one fetcher (and thus one connection pool) per task
      tags.flatMap { tag =>
        fetcher.fetch(tag).iterator.flatMap(splitTopLevelArray)
      }
    }
    spark.read.schema(Tables.battleSchema).json(jsonLines)
  }

  /** Split a JSON array body into its top-level element strings without a
    * JSON library (quote/escape/depth scan) — keeps the hot path
    * dependency-free and single-pass. */
  private[graft] def splitTopLevelArray(body: String): Iterator[String] = {
    val s = body.trim
    if (!s.startsWith("[")) return Iterator.empty
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = -1
    var i = 1
    while (i < s.length - 0) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' =>
          if (depth == 0 && c == '{') start = i
          depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += s.substring(start, i + 1); start = -1 }
        case _ =>
      }
      i += 1
    }
    out.result().iterator
  }
}
