package graft

import graft.plans.WorkflowExecutor
import graft.plans.WorkflowExecutor._
import org.scalatest.funsuite.AnyFunSuite

class WorkflowExecutorSpec extends AnyFunSuite {

  private def agent(tasks: Task*) = AgentState(
    agentId = "a1", name = "writer", context = "ctx", goal = "write article",
    tasks = tasks)

  private val okValidate = (t: Task, out: String) => Validation(isValid = true, 90, "ok")

  test("tasks run in id order with accumulated prior context") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val res = WorkflowExecutor.execute(
      agent(Task(3, "t3", "d3", "e3"), Task(1, "t1", "d1", "e1"), Task(2, "t2", "d2", "e2")),
      runTask = (t, ctx) => { seen += ((t.id, ctx)); s"out${t.id}" },
      validateTask = okValidate)
    assert(seen.map(_._1).toSeq == Seq(1, 2, 3))
    assert(seen(0)._2 == "")
    assert(seen(1)._2.contains("[Task 1: t1]") && seen(1)._2.contains("out1"))
    assert(seen(2)._2.contains("out1") && seen(2)._2.contains("out2"))
    assert(res.agent.status == "completed")
    assert(res.wordCount == 3)
  }

  test("invalid task fails the workflow and stops execution") {
    val res = WorkflowExecutor.execute(
      agent(Task(1, "t1", "d", "e"), Task(2, "t2", "d", "e")),
      runTask = (t, _) => s"out${t.id}",
      validateTask = (t, _) =>
        if (t.id == 1) Validation(isValid = false, 10, "bad") else okValidate(t, ""))
    assert(res.agent.status == "failed")
    assert(res.agent.tasks.find(_.id == 1).get.status == "failed")
    assert(res.agent.tasks.find(_.id == 2).get.status == "created")
  }

  test("completed tasks are skipped; halt gate stops between tasks") {
    var ran = List.empty[Int]
    val res = WorkflowExecutor.execute(
      agent(Task(1, "t1", "d", "e", status = "completed", output = "done1",
        validation = Some(Validation(isValid = true, 100, ""))),
        Task(2, "t2", "d", "e"), Task(3, "t3", "d", "e")),
      runTask = (t, ctx) => { ran ::= t.id; assert(ctx.contains("done1")); s"o${t.id}" },
      validateTask = okValidate,
      haltCheck = () => true)
    assert(ran == List(2)) // task 2 ran, then halt gate before task 3
    assert(res.halted && res.agent.status == "halted")
  }

  test("retrieval context is appended to the prompt block and recorded as a tool call") {
    var got = ""
    val res = WorkflowExecutor.execute(
      agent(Task(1, "t1", "find facts", "e")),
      runTask = (_, ctx) => { got = ctx; "out" },
      validateTask = okValidate,
      retrieve = Some(q => WorkflowExecutor.TaskRetrieval(s"RETRIEVED<$q>",
        WorkflowExecutor.ToolCall("faiss_retrieval", q, 3, 0.7, 0.01))))
    assert(got.contains("RETRIEVED<ctx\n\nfind facts>"))
    // tool_call stored on the task (`components2/workflow_executor.py:260-262`)
    val tc = res.taskResults.head.task.toolCall.get
    assert(tc.toolType == "faiss_retrieval" && tc.numDocuments == 3 &&
      tc.query.contains("find facts"))
  }

  test("repair: running->created, completed-but-invalid->failed") {
    val a = WorkflowExecutor.repair(agent(
      Task(1, "t", "d", "e", status = "running"),
      Task(2, "t", "d", "e", status = "completed",
        validation = Some(Validation(isValid = false, 0, ""))),
      Task(3, "t", "d", "e", status = "completed",
        validation = Some(Validation(isValid = true, 90, "")))))
    assert(a.tasks.map(_.status) == Seq("created", "failed", "completed"))
  }

  test("planTasks parses fenced and plain tasklists, rejects garbage") {
    val fenced =
      "```json\n{\"goal\": \"g\", \"tasks\": [{\"id\": 1, \"name\": \"n\", \"description\": \"d\", \"expected_output\": \"e\"}]}\n```"
    val Some((goal, tasks)) = WorkflowExecutor.planTasks(fenced)
    assert(goal == "g" && tasks == Seq(Task(1, "n", "d", "e")))
    assert(WorkflowExecutor.planTasks("no json here").isEmpty)
    assert(WorkflowExecutor.planTasks("{\"tasks\": []}").isEmpty)       // missing goal
    assert(WorkflowExecutor.planTasks("{\"goal\": \"g\", \"tasks\": 5}").isEmpty) // non-array
    assert(WorkflowExecutor.planTasks("{\"goal\": \"g\", \"tasks\": [{\"name\": \"x\"}]}").isEmpty) // missing id
  }
}
