package graft.cdc

/** The CDC change-event envelope (binlog record) for the source-code-repo
  * table, per BASELINE.json `input_hint` and FIXTURES.md §2.
  *
  * Semantics mirror the reference's snapshot-replay model
  * (HTTPArchive/data-pipeline: one HAR file per (date, client, page) key,
  * reference `modules/transformation.py:22-66`): here one event per
  * (repo, path) key at a given (commit, lsn).
  *
  *  - `(repo, path)`   upsert key (analog of the reference's (date,client,page))
  *  - `(commit, lsn)`  total, unique last-writer-wins ordering key
  *  - `op`             I / U / D (D = tombstone, content null)
  *  - `lang`           nullable; appears mid-stream (schema-evolution demo)
  */
final case class ChangeEvent(
    repo: String,
    path: String,
    commit: String,
    lsn: Long,
    op: String,
    lang: String,
    content: String
)

/** The materialized snapshot-table row (current state per key). */
final case class RepoFile(
    repo: String,
    path: String,
    commit: String,
    lsn: Long,
    lang: String,
    content: String
)
