package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** Structured-conversation (SFT/chat transcript) operators — the QA
  * pass every instruction-tuning pipeline runs before a transcript is
  * allowed into a training mix: parse the serialized turn list with
  * Spark's native JSON reader, then validate the conversational
  * contract (known roles, system-prompt position, strict user ↔
  * assistant alternation, no empty turns) and compute the per-role
  * token accounting that mixture budgeting needs.
  *
  * Design: schema-on-read with `from_json` against a FIXED turn
  * schema — Catalyst's Jackson-based parser, codegen-projected, no
  * UDF — then ordinary window/agg machinery. Transcripts are rows,
  * turns are exploded rows, and every validation flag is an
  * aggregate over turns, so the whole surface is two shuffles (the
  * doc-keyed window + the doc-keyed fold) regardless of corpus size.
  */
object Chat {

  /** The wire schema of one serialized transcript: a JSON array of
    * `{"role": ..., "content": ...}` turn objects (the de-facto chat
    * interchange shape). Extra keys in the payload are ignored by
    * `from_json`; missing keys surface as NULL for the validator. */
  val turnSchema: ArrayType =
    ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType))))

  /** Roles the validator accepts. */
  val allowedRoles: Seq[String] = Seq("system", "user", "assistant")

  /** Parse a JSON-transcript column into one row per turn:
    * `(idCol, turn_idx, role, content)`, `turn_idx` the 0-based
    * position within its conversation.
    *
    * Degradation is typed and total: a malformed / NULL transcript
    * parses to NULL (Spark's PERMISSIVE JSON mode) and contributes
    * ZERO turn rows — it disappears from the turn frame, which is the
    * documented contract (pre-filter with `transcript IS NOT NULL AND
    * from_json(...) IS NOT NULL` to quarantine malformed rows; a
    * conversation absent from [[validateTurns]]' output is
    * unparseable, not valid).
    *
    * Scale posture: `from_json` + `posexplode` is a zero-shuffle
    * codegen'd projection over scan output — parse cost is linear in
    * payload bytes and fully distributed. */
  def parseTurns(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(from_json(col(jsonCol), turnSchema)))
      .select(col(idCol), col("pos").cast("long").as("turn_idx"),
        col("col.role").as("role"), col("col.content").as("content"))

  /** Fold a turn frame (the [[parseTurns]] shape) into one
    * validation-and-accounting row per conversation:
    *
    *  - `n_turns`, `n_system`, `n_user`, `n_assistant` — turn counts;
    *  - `user_tokens`, `assistant_tokens` — whitespace-token mass per
    *    trainable role (the numbers a mixture budget sums);
    *  - `roles_ok` — every role is one of [[allowedRoles]];
    *  - `starts_ok` — the conversation opens with `user`, or with
    *    `system` followed by `user`, and `system` never appears past
    *    turn 0;
    *  - `alternation_ok` — no two consecutive turns share a role
    *    (strict speaker alternation; a doubled user OR assistant turn
    *    fails);
    *  - `nonempty_ok` — every turn carries at least one token
    *    (NULL content counts as empty);
    *  - `valid` — the conjunction, the admission gate.
    *
    * Scale posture: one window (`lag` over doc-keyed turn order) and
    * one doc-keyed aggregate — both shuffle on the conversation id
    * with uniform keys (turn counts are small constants), and the
    * aggregate is a map-side-combinable fold of counters and
    * violation maxima. No collects, no joins.
    *
    * `roles` widens the whitelist for agentic corpora — pass
    * `allowedRoles :+ "tool"` so a properly-nested tool-result turn
    * (whose PROTOCOL [[validateToolUse]] checks separately) doesn't
    * trip `roles_ok`; every other flag is role-set-independent. */
  def validateTurns(
      turns: DataFrame,
      idCol: String,
      roles: Seq[String] = allowedRoles): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy("turn_idx")
    val withPrev = turns
      .withColumn("__prev_role", lag(col("role"), 1).over(w))
      .withColumn("__tok",
        when(col("content").isNull, lit(0L))
          .otherwise(TextFunctions.tokenCount(col("content"))))
    def anyOf(cond: org.apache.spark.sql.Column) =
      max(when(cond, 1).otherwise(0))
    withPrev.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "system", 1L).otherwise(0L)).as("n_system"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
        sum(when(col("role") === "user", col("__tok")).otherwise(0L)).as("user_tokens"),
        sum(when(col("role") === "assistant", col("__tok")).otherwise(0L)).as("assistant_tokens"),
        (anyOf(!col("role").isin(roles: _*) || col("role").isNull) === 0).as("roles_ok"),
        ((anyOf(col("turn_idx") === 0 && col("role") === "user") === 1 ||
          (anyOf(col("turn_idx") === 0 && col("role") === "system") === 1 &&
            anyOf(col("turn_idx") === 1 && col("role") === "user") === 1)) &&
          anyOf(col("role") === "system" && col("turn_idx") > 0) === 0).as("starts_ok"),
        (anyOf(col("__prev_role") === col("role")) === 0).as("alternation_ok"),
        (anyOf(col("__tok") === 0) === 0).as("nonempty_ok"))
      .withColumn("valid",
        col("roles_ok") && col("starts_ok") &&
          col("alternation_ok") && col("nonempty_ok"))
  }

  /** ZERO-SHUFFLE transcript validation — the same row contract as
    * `validateTurns(parseTurns(df))` computed as ONE codegen'd
    * projection with higher-order array functions (`filter` /
    * `exists` / `aggregate` over the parsed turn array), no explode,
    * no window, no aggregate: where the exploded pipeline shuffles
    * the turn frame twice on the conversation id, this streams
    * straight through the scan. Measured trade (BASELINE.md wave 21):
    * higher-order lambdas evaluate OUTSIDE whole-stage codegen, so in
    * LOCAL mode — where an exchange is a memcpy — the exploded twin
    * is ~1.3× faster at sf1; on a real cluster the two network
    * exchanges this shape avoids are the bigger cost. It is also the
    * streaming-safe shape: stateless per row, it drops into a
    * `readStream` pipeline unchanged (the window fold cannot).
    *
    * Contract parity with the exploded pipeline (spec-pinned and
    * oracle-shared): malformed/NULL transcripts AND zero-turn (`[]`)
    * transcripts produce no output row; every flag treats a NULL
    * comparison as a non-violation exactly as the window fold's
    * `when(pred, 1).otherwise(0)` does. */
  def validateTranscripts(df: DataFrame, idCol: String, jsonCol: String): DataFrame = {
    def tokC(t: org.apache.spark.sql.Column) =
      when(t.isNull, lit(0L)).otherwise(TextFunctions.tokenCount(t))
    def cf(pred: org.apache.spark.sql.Column) = coalesce(pred, lit(false))
    // Tokenizing content is the expensive per-turn work (split +
    // filter over the text) — do it exactly ONCE per turn into a
    // light (role, tok) array; every flag then folds over 16-byte
    // structs instead of re-splitting the text (measured 1.6× at
    // sf1 when each flag re-derived its own token counts).
    val parsed = df
      .withColumn("__raw", from_json(col(jsonCol), turnSchema))
      .filter(col("__raw").isNotNull && size(col("__raw")) > 0)
      .withColumn("__t", transform(col("__raw"), t =>
        struct(t("role").as("role"), tokC(t("content")).as("tok"))))
    val a = col("__t")
    // ONE fold carries every per-turn counter and violation bit —
    // higher-order array functions evaluate their lambdas outside
    // whole-stage codegen, so each extra pass over the array is real
    // interpreted work; nine single-purpose passes measured 1.4×
    // slower than this fused accumulator at sf1.
    def cnt(t: org.apache.spark.sql.Column, r: String) =
      when(t("role") === r, 1L).otherwise(0L)
    def tokOf(t: org.apache.spark.sql.Column, r: String) =
      when(t("role") === r, t("tok")).otherwise(lit(0L))
    val zero = struct(
      lit(0L).as("ns"), lit(0L).as("nu"), lit(0L).as("na"),
      lit(0L).as("ut"), lit(0L).as("at"),
      lit(false).as("bad"), lit(false).as("emp"))
    val fold = aggregate(a, zero, (acc, t) => struct(
      (acc("ns") + cnt(t, "system")).as("ns"),
      (acc("nu") + cnt(t, "user")).as("nu"),
      (acc("na") + cnt(t, "assistant")).as("na"),
      (acc("ut") + tokOf(t, "user")).as("ut"),
      (acc("at") + tokOf(t, "assistant")).as("at"),
      (acc("bad") || cf(!t("role").isin(allowedRoles: _*)) ||
        t("role").isNull).as("bad"),
      (acc("emp") || cf(t("tok") === 0)).as("emp")))
    // try_element_at: a single-turn transcript has no second element
    // and ANSI element_at throws instead of returning NULL
    val r1 = try_element_at(a, lit(1))("role")
    val r2 = try_element_at(a, lit(2))("role")
    parsed
      .withColumn("__f", fold)
      .select(
        col(idCol),
        size(a).cast("long").as("n_turns"),
        col("__f")("ns").as("n_system"),
        col("__f")("nu").as("n_user"),
        col("__f")("na").as("n_assistant"),
        col("__f")("ut").as("user_tokens"),
        col("__f")("at").as("assistant_tokens"),
        (!col("__f")("bad")).as("roles_ok"),
        cf((r1 === "user" || (r1 === "system" && cf(r2 === "user"))) &&
          !exists(slice(a, lit(2), size(a) - 1),
            t => cf(t("role") === "system"))).as("starts_ok"),
        (!when(size(a) > 1,
          exists(sequence(lit(1), size(a) - 1), i =>
            cf(element_at(a, i)("role") === element_at(a, i + 1)("role"))))
          .otherwise(lit(false))).as("alternation_ok"),
        (!col("__f")("emp")).as("nonempty_ok"))
      .withColumn("valid",
        col("roles_ok") && col("starts_ok") &&
          col("alternation_ok") && col("nonempty_ok"))
  }

  /** The agentic wire schema: [[turnSchema]] plus an optional
    * `tool_calls` array on each turn (`{"name": ...}` per call —
    * the function-calling interchange shape). Turns without the key
    * parse with a NULL `tool_calls`. */
  val toolTurnSchema: ArrayType =
    ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType),
      StructField("tool_calls", ArrayType(StructType(Seq(
        StructField("name", StringType))))))))

  /** [[parseTurns]] for agentic transcripts: one row per turn with
    * `call_names` (the turn's tool-call names, `[]` when absent) and
    * `n_calls`. Same typed degradation: malformed JSON → zero rows. */
  def parseToolTurns(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(from_json(col(jsonCol), toolTurnSchema)))
      .select(col(idCol), col("pos").cast("long").as("turn_idx"),
        col("col.role").as("role"), col("col.content").as("content"),
        coalesce(col("col.tool_calls.name"),
          array().cast("array<string>")).as("call_names"))
      .withColumn("n_calls", size(col("call_names")).cast("long"))

  /** Validate the TOOL-USE protocol of agentic transcripts (the
    * [[parseToolTurns]] shape) — the three invariants an agentic-SFT
    * corpus must hold before the tool-calling loss makes sense, one
    * row per conversation:
    *
    *  - `tool_after_call_ok` — every `tool` turn directly follows an
    *    assistant turn that issued ≥1 tool call, or another tool turn
    *    (chained results); an orphan tool result is a corrupt trace;
    *  - `tools_answered_ok` — every assistant turn that issued tool
    *    calls is immediately followed by a `tool` turn (the calls
    *    were actually executed in-trace);
    *  - `tool_names_ok` — every called name is in `allowedTools`
    *    (the tool registry the model will actually be given);
    *  - counts: `n_turns`, `n_tool_calls`, `n_tool_turns`;
    *  - `valid` — the conjunction.
    *
    * Scale posture: identical to [[validateTurns]] — one doc-keyed
    * window (lag role/calls + lead role) and one doc-keyed
    * map-side-combinable fold. */
  def validateToolUse(
      turns: DataFrame,
      idCol: String,
      allowedTools: Seq[String]): DataFrame = {
    require(allowedTools.nonEmpty, "allowedTools must be non-empty")
    val w = Window.partitionBy(idCol).orderBy("turn_idx")
    val t = turns
      .withColumn("__prev_role", lag(col("role"), 1).over(w))
      .withColumn("__prev_calls", lag(col("n_calls"), 1).over(w))
      .withColumn("__next_role", lead(col("role"), 1).over(w))
    def anyOf(cond: org.apache.spark.sql.Column) =
      max(when(cond, 1).otherwise(0))
    val prevOk = coalesce(
      (col("__prev_role") === "assistant" && col("__prev_calls") > 0) ||
        col("__prev_role") === "tool", lit(false))
    t.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(col("n_calls")).as("n_tool_calls"),
        sum(when(col("role") === "tool", 1L).otherwise(0L)).as("n_tool_turns"),
        (anyOf(col("role") === "tool" && !prevOk) === 0).as("tool_after_call_ok"),
        (anyOf(col("role") === "assistant" && col("n_calls") > 0 &&
          !coalesce(col("__next_role") === "tool", lit(false))) === 0)
          .as("tools_answered_ok"),
        (anyOf(exists(col("call_names"),
          n => !n.isInCollection(allowedTools))) === 0).as("tool_names_ok"))
      .withColumn("valid",
        col("tool_after_call_ok") && col("tools_answered_ok") &&
          col("tool_names_ok"))
  }
}
