package graft.plans

/** Agent workflow engine (SURVEY §3.3, System 2): LLM-planned task lists
  * executed in id order with previous-task context accumulation (W3),
  * per-task validation, halt gates (ST3), and validated-output write-back
  * (ST4).
  *
  * Mirrors `components2/workflow_executor.py:81-334` +
  * `components2/task_executor.py:55-204` as *engine logic*: the LLM calls
  * are pluggable functions (deterministic fakes in tests), the
  * orchestration — ordering, context assembly, validation gating, state
  * transitions, repair — is reproduced exactly. Execution is inherently
  * sequential (task i's prompt embeds outputs of tasks < i), so this is a
  * driver loop; the *retrieval* inside each task is a Spark job.
  */
object WorkflowExecutor {

  final case class Task(
      id: Int, name: String, description: String, expectedOutput: String,
      status: String = "created",      // created|running|completed|failed|cancelled
      output: String = "",
      validation: Option[Validation] = None,
      toolCall: Option[ToolCall] = None)

  final case class Validation(isValid: Boolean, score: Int, reason: String)

  /** Per-task tool-call record (`components2/workflow_executor.py:249-262`
    * stores the FAISS retrieval made for a task on the task itself;
    * `components2/task_executor.py:361-400` is the emit site). */
  final case class ToolCall(
      toolType: String, query: String, numDocuments: Int,
      thresholdUsed: Double, retrievalTime: Double)

  /** A task's retrieval outcome: the context string plus its record. */
  final case class TaskRetrieval(context: String, toolCall: ToolCall)

  final case class AgentState(
      agentId: String, name: String, context: String, goal: String,
      tasks: Seq[Task], halt: Boolean = false, status: String = "created")

  final case class TaskResult(task: Task, contextUsed: Seq[(Int, String, String)])

  final case class WorkflowResult(
      agent: AgentState, subject: String,
      taskResults: Seq[TaskResult], wordCount: Long, halted: Boolean)

  /** Load-time state repair (`components2/agent_manager.py:41-58`):
    * running → created; completed-but-invalid → failed. */
  def repair(agent: AgentState): AgentState =
    agent.copy(tasks = agent.tasks.map { t =>
      if (t.status == "running") t.copy(status = "created")
      else if (t.status == "completed" && !t.validation.exists(_.isValid))
        t.copy(status = "failed")
      else t
    })

  /** W3 context block: outputs of all completed tasks with id < current,
    * in id order (`components2/task_executor.py:229-271`). */
  def previousContext(tasks: Seq[Task], currentId: Int): Seq[(Int, String, String)] =
    tasks.filter(t => t.id < currentId && t.status == "completed")
      .sortBy(_.id)
      .map(t => (t.id, t.name, t.output))

  /** Execute the workflow: tasks sorted by id (T2), completed tasks
    * skipped, halt gate between tasks (not after the last), each task
    * LLM-executed with accumulated context then LLM-validated; invalid →
    * failed and the workflow stops (reference halts the run). */
  def execute(agentIn: AgentState,
              runTask: (Task, String) => String,           // (task, contextBlock) => output
              validateTask: (Task, String) => Validation,  // (task, output) => verdict
              retrieve: Option[String => TaskRetrieval] = None, // query => context + record
              haltCheck: () => Boolean = () => false): WorkflowResult = {
    val agent = repair(agentIn)
    var tasks = agent.tasks.sortBy(_.id)
    val results = scala.collection.mutable.ArrayBuffer.empty[TaskResult]
    var halted = false
    var failed = false
    var idx = 0
    while (idx < tasks.length && !halted && !failed) {
      val task = tasks(idx)
      if (task.status != "completed") {
        val prev = previousContext(tasks, task.id)
        val retrieved = retrieve.map(r => r(agent.context + "\n\n" + task.description))
        val contextBlock = (prev.map { case (id, name, out) =>
          s"[Task $id: $name]\n$out"
        } ++ retrieved.map(_.context).toSeq).mkString("\n\n")
        val running = task.copy(status = "running")
        tasks = tasks.updated(idx, running)
        val output = runTask(running, contextBlock)
        val verdict = validateTask(running, output)
        val done = running.copy(
          status = if (verdict.isValid) "completed" else "failed",
          output = output, validation = Some(verdict),
          toolCall = retrieved.map(_.toolCall))
        tasks = tasks.updated(idx, done)
        results += TaskResult(done, prev)
        if (!verdict.isValid) failed = true
        // Halt gate between tasks, never after the last
        // (`components2/workflow_executor.py:276-281`).
        else if (idx < tasks.length - 1 && haltCheck()) halted = true
      }
      idx += 1
    }
    val completedOutputs = tasks.filter(_.status == "completed").map(_.output)
    WorkflowResult(
      agent = agent.copy(tasks = tasks,
        status = if (failed) "failed" else if (halted) "halted" else "completed"),
      subject = agent.goal,
      taskResults = results.toSeq,
      wordCount = completedOutputs.map(_.split("\\s+").count(_.nonEmpty).toLong).sum,
      halted = halted)
  }

  /** Tasklist planning from an LLM response (F5): parse + validate the
    * JSON; None reproduces the halted-error result path
    * (`components2/workflow_executor.py:467-488`). */
  def planTasks(llmResponse: String): Option[(String, Seq[Task])] = {
    // Scala-side twin of LlmParsing.parseTasklist for driver use.
    val m = java.util.regex.Pattern.compile("(?s)\\{.*\\}").matcher(llmResponse)
    if (!m.find()) return None
    try ujsonLite(m.group(0)) catch { case _: Throwable => None }
  }

  // Minimal dependency-free JSON tasklist reader (goal + tasks[id,name,
  // description,expected_output]) built on Spark's bundled Jackson.
  private def ujsonLite(body: String): Option[(String, Seq[Task])] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(body)
    val goal = Option(root.get("goal")).map(_.asText()).getOrElse(return None)
    val tasksNode = Option(root.get("tasks")).getOrElse(return None)
    if (!tasksNode.isArray) return None
    val tasks = (0 until tasksNode.size()).map { i =>
      val t = tasksNode.get(i)
      Task(
        id = Option(t.get("id")).map(_.asInt()).getOrElse(return None),
        name = Option(t.get("name")).map(_.asText()).getOrElse(return None),
        description = Option(t.get("description")).map(_.asText()).getOrElse(""),
        expectedOutput = Option(t.get("expected_output")).map(_.asText()).getOrElse(""))
    }
    Some((goal, tasks))
  }
}
