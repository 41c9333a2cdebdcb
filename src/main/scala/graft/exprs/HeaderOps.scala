package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Header-multimap parsing (reference `modules/utils.py:125-152` +
  * `modules/constants.py:61-95`), re-expressed with Catalyst higher-order
  * functions over `array<struct<name,value>>` — no UDF, stays codegen-able.
  *
  * Reference semantics: header names case-insensitive; standard headers
  * collected into a name→values multimap with 255-char value truncation and
  * repeats appended; the cookie header is not stored, only its byte size;
  * everything else concatenated into one "name = value, ..." string.
  */
object HeaderOps {

  /** The reference's standard request-header mapping
    * (`modules/constants.py:61-77`, GH_REQ_HEADERS). */
  val reqHeaders: Map[String, String] = Map(
    "accept" -> "req_accept",
    "accept-charset" -> "req_accept_charset",
    "accept-encoding" -> "req_accept_encoding",
    "accept-language" -> "req_accept_language",
    "connection" -> "req_connection",
    "host" -> "req_host",
    "if-modified-since" -> "req_if_modified_since",
    "if-none-match" -> "req_if_none_match",
    "referer" -> "req_referer",
    "user-agent" -> "req_user_agent"
  )

  /** The reference's standard response-header mapping
    * (`modules/constants.py:79-95`, GH_RESP_HEADERS). */
  val respHeaders: Map[String, String] = Map(
    "accept-ranges" -> "resp_accept_ranges",
    "age" -> "resp_age",
    "cache-control" -> "resp_cache_control",
    "connection" -> "resp_connection",
    "content-encoding" -> "resp_content_encoding",
    "content-language" -> "resp_content_language",
    "content-length" -> "resp_content_length",
    "content-location" -> "resp_content_location",
    "content-type" -> "resp_content_type",
    "date" -> "resp_date",
    "etag" -> "resp_etag",
    "expires" -> "resp_expires",
    "keep-alive" -> "resp_keep_alive",
    "last-modified" -> "resp_last_modified",
    "location" -> "resp_location",
    "pragma" -> "resp_pragma",
    "server" -> "resp_server",
    "transfer-encoding" -> "resp_transfer_encoding",
    "vary" -> "resp_vary",
    "via" -> "resp_via",
    "x-powered-by" -> "resp_x_powered_by"
  )

  /** name→values multimap of the standard headers present, values truncated
    * to 255 chars, repeats appended in order. `map<string, array<string>>`. */
  def standardMultimap(headers: Column, standard: Map[String, String]): Column = {
    val entries = standard.toSeq.sortBy(_._2).map { case (lcName, columnName) =>
      val values = transform(
        filter(headers, h => lower(h.getField("name")) === lcName),
        h => substring(h.getField("value"), 1, 255))
      struct(lit(columnName).as("key"), values.as("value"))
    }
    map_filter(map_from_entries(array(entries: _*)), (_, v) => size(v) > 0)
  }

  /** Byte size of the cookie header(s) — untruncated values
    * (reference: `cookie_size += len(orig_value)`). */
  def cookieSize(headers: Column, cookieKey: String): Column =
    aggregate(
      filter(headers, h => lower(h.getField("name")) === cookieKey),
      lit(0L),
      (acc, h) => acc + length(h.getField("value")).cast("long"))

  /** "name = value, name = value" concat of all non-standard, non-cookie
    * headers (original case, untruncated values). */
  def otherHeaders(headers: Column, standard: Map[String, String], cookieKey: String): Column = {
    val stdKeys = standard.keys.toSeq
    array_join(
      transform(
        filter(headers, h => {
          val lc = lower(h.getField("name"))
          !lc.isInCollection(stdKeys :+ cookieKey)
        }),
        h => concat(h.getField("name"), lit(" = "), h.getField("value"))),
      ", ")
  }

  /** Flatten a multimap value to the reference's sink form:
    * `", ".join(values)` (reference `modules/transformation.py:399`). */
  def joinedHeader(multimap: Column, key: String): Column =
    array_join(element_at(multimap, key), ", ")
}
