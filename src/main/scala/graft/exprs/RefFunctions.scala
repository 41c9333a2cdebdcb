package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-parity scalar function library (SURVEY.md §2.3), re-expressed
  * as pure Catalyst `Column` combinators — codegen'd `when/otherwise` chains
  * and string expressions, no UDFs in the hot path.
  *
  * Exact-output contracts come from the reference's golden tests
  * (`reference/test/test_utils.py`); each function cites its source.
  */
object RefFunctions {

  /** First 4 hex chars of md5(url) as an int
    * (reference `modules/utils.py:24-25`; goldens: "https://google.com/" →
    * 63524, "" → 54301). */
  def getUrlHash(url: Column): Column =
    conv(substring(md5(url), 1, 4), 16, 10).cast("long")

  /** sha256 hex of a column — the reference's partitioning/verification hash
    * (`modules/import_all.py:385-388`). */
  def hashUrl(url: Column): Column = sha2(url, 256)

  /** File extension from a URL (reference `modules/utils.py:28-44`):
    * strip query string, take the segment after the last '/', then after the
    * last '.'; empty when there is no dot or the candidate is longer than
    * 5 chars (weeds out non-extensions). */
  def getExt(url: Column): Column = {
    val noQuery = substring_index(url, "?", 1)
    val base = substring_index(noQuery, "/", -1)
    val ext = when(base.contains("."), substring_index(base, ".", -1)).otherwise(lit(""))
    when(length(ext) > 5, lit("")).otherwise(ext)
  }

  /** Canonical resource type from (mimeType, ext) — the reference's
    * order-sensitive substring rule chain (`modules/utils.py:48-94`). The
    * order is behavior: "html" is matched LAST among mime rules because
    * text/html is widely misused; "text" comes after ext rules for the same
    * reason. */
  def prettyType(mimeTyp: Column, ext: Column): Column = {
    val m = lower(mimeTyp)
    val extIn = (vals: Seq[String]) => ext.isInCollection(vals)
    when(m.contains("font"), "font")
      .when(m.contains("css"), "css")
      .when(m.contains("image"), "image")
      .when(m.contains("script"), "script")
      .when(m.contains("video"), "video")
      .when(m.contains("audio"), "audio")
      .when(m.contains("xml"), "xml")
      .when(m.contains("json") || extIn(Seq("js", "json")), "script")
      .when(extIn(Seq("eot", "ttf", "woff", "woff2", "otf")), "font")
      .when(extIn(Seq("png", "gif", "jpg", "jpeg", "webp", "ico", "svg",
        "avif", "jxl", "heic", "heif")), "image")
      .when(ext === "css", "css")
      .when(ext === "xml", "xml")
      .when(m.contains("flash") || m.contains("webm") || m.contains("mp4") ||
        m.contains("flv") ||
        extIn(Seq("mp4", "webm", "ts", "m4v", "m4s", "mov", "ogv", "swf",
          "f4v", "flv")), "video")
      .when(m.contains("wasm") || ext === "wasm", "wasm")
      .when(m.contains("html") || extIn(Seq("html", "htm")), "html")
      .when(m.contains("text"), "text")
      .otherwise("other")
  }

  /** Image/video format from (prettyType, mime, ext)
    * (reference `modules/utils.py:97-121`); jpeg → jpg. */
  def getFormat(prettyTyp: Column, mimeTyp: Column, ext: Column): Column = {
    val imageFormats = Seq("jpg", "png", "gif", "webp", "svg", "ico", "avif",
      "jxl", "heic", "heif")
    val videoFormats = Seq("flash", "swf", "mp4", "flv", "f4v")
    def chain(formats: Seq[String], tail: Column): Column =
      formats.foldRight(tail) { (f, acc) =>
        when(mimeTyp.contains(f) || ext === f, lit(f)).otherwise(acc)
      }
    when(prettyTyp === "image",
      chain(imageFormats, when(mimeTyp.contains("jpeg"), "jpg").otherwise("")))
      .when(prettyTyp === "video", chain(videoFormats, lit("")))
      .otherwise("")
  }

  /** INT64 clamp: negatives → null, cap at 2^63-1
    * (reference `modules/utils.py:198-212`). The cap is a no-op for LongType
    * input (already ≤ 2^63-1) but kept explicit for doubles/decimals. */
  def clampInteger(n: Column): Column =
    when(n < 0, lit(null)).otherwise(least(n, lit(Long.MaxValue)))

  /** snake_case → PascalCase label formatting (reference
    * `modules/utils.py:236-237`, F17 — the transform display names): split
    * on underscores, capitalize each word, lowercase the rest, rejoin.
    * `initcap` matches Python `.title()` for the alpha-word names the
    * reference feeds it (they diverge only on intra-word digits). */
  def labelFormat(name: Column): Column =
    regexp_replace(initcap(regexp_replace(name, "_", " ")), " ", "")

  /** Scala-side twin for driver/display use on plain strings — mirrors the
    * reference chain exactly (replace _ → space, title per space-delimited
    * word, strip spaces), locale-pinned so a tr-TR JVM can't produce
    * dotless-i labels that diverge from the Column/SQL path. */
  def labelFormat(name: String): String =
    name.replace('_', ' ').split(" ", -1).map { w =>
      if (w.isEmpty) ""
      else w.substring(0, 1).toUpperCase(java.util.Locale.ROOT) +
        w.substring(1).toLowerCase(java.util.Locale.ROOT)
    }.mkString

  /** desktop/mobile from crawl file path (reference `modules/utils.py:162-171`):
    * dir prefix chrome/android, else _Dx/_Mx marker in the file name, else
    * the lower-cased dir prefix. */
  def clientName(fileName: Column): Column = {
    val dirName = substring_index(fileName, "/", -2)
    val dir = substring_index(dirName, "/", 1)
    val base = substring_index(fileName, "/", -1)
    val clientRaw = substring_index(dir, "-", 1)
    when(clientRaw === "chrome" || base.contains("_Dx"), "desktop")
      .when(clientRaw === "android" || base.contains("_Mx"), "mobile")
      .otherwise(lower(clientRaw))
  }

  /** Crawl date from dir name like ".../android-Apr_1_2022"
    * (reference `modules/utils.py:192-195`). */
  def crawlDate(dirName: Column): Column = {
    val last = substring_index(dirName, "/", -1)
    val datePart = regexp_replace(substring_index(last, "-", -1), "_", " ")
    coalesce(
      to_date(datePart, "MMM d yyyy"),
      to_date(datePart, "MMMM d yyyy")
    )
  }

  /** url[:255] (reference `modules/transformation.py:284,480`). */
  def urlShort(url: Column): Column = substring(url, 1, 255)

  /** (pageid << 32) + entry_number composite key
    * (reference `modules/transformation.py:238`). */
  def requestId(pageId: Column, entryNumber: Column): Column =
    shiftleft(pageId.cast("long"), 32) + entryNumber.cast("long")

  /** Hostname incl. port via the reference's regex — deliberately NOT
    * parse_url(HOST), which drops the port (`modules/transformation.py:592`). */
  def hostname(url: Column): Column =
    regexp_extract(url, "(?:http|ws)s?://([^/]*)", 1)

  /** Lenient datetime-string → rounded epoch seconds, null on failure
    * (reference `modules/utils.py:182-189`). */
  def datetimeToEpoch(dt: Column): Column = {
    // RFC-1123 weekday prefixes ("Tue, ") can't be parsed by Spark 3+'s
    // formatter (EEE is a prohibited parse pattern) — strip them first.
    val cleaned = regexp_replace(dt, "^[A-Za-z]{3},\\s*", "")
    val ts = coalesce(
      try_to_timestamp(dt),
      try_to_timestamp(dt, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(dt, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(cleaned, lit("dd MMM yyyy HH:mm:ss zzz")),
      try_to_timestamp(cleaned, lit("dd MMM yyyy HH:mm:ss")),
      try_to_timestamp(dt, lit("yyyy-MM-dd"))
    )
    round(unix_timestamp(ts)).cast("long")
  }

  /** Cache lifetime in seconds (reference `modules/transformation.py:351-396`):
    * 0 if Cache-Control has must-revalidate/no-cache/no-store; else the
    * max-age value when CC starts with max-age=\d+; else Expires − (Date |
    * startedDateTime); clamped ≥ 0, null-safe. */
  def expAge(cacheControl: Column, expires: Column, respDate: Column,
      startedDateTimeEpoch: Column): Column = {
    val ccBlocked = cacheControl.isNotNull && (
      cacheControl.contains("must-revalidate") ||
      cacheControl.contains("no-cache") ||
      cacheControl.contains("no-store"))
    val maxAgeStr = regexp_extract(cacheControl, "^max-age=(\\d+)", 1)
    val startEpoch = coalesce(datetimeToEpoch(respDate), startedDateTimeEpoch)
    val expiresDelta = datetimeToEpoch(expires) - startEpoch
    greatest(
      when(ccBlocked, lit(0L))
        .when(cacheControl.isNotNull && maxAgeStr =!= "",
          clampInteger(maxAgeStr.cast("long")))
        .when(expires.isNotNull, coalesce(expiresDelta, lit(0L)))
        .otherwise(lit(0L)),
      lit(0L)
    )
  }

  /** Home-page filter over a JSON metadata string (reference
    * `modules/utils.py:220-233`): crawl_depth == 0; missing metadata →
    * legacy, treated as home page. */
  def isHomePage(metadataJson: Column): Column =
    when(metadataJson.isNull, lit(true))
      .otherwise(
        coalesce(get_json_object(metadataJson, "$.crawl_depth").cast("int"), lit(0)) === 0)

  /** expAge histogram bucket (reference `modules/transformation.py:604-618`):
    * null, 0, ≤1d, ≤30d, ≤365d, more. */
  def expAgeBucket(expAge: Column): Column =
    when(expAge.isNull, "null")
      .when(expAge === 0, "0")
      .when(expAge <= 86400L, "1d")
      .when(expAge <= 2592000L, "30d")
      .when(expAge <= 31536000L, "365d")
      .otherwise("more")
}
