"""Agentic workflow engine — agentic_workflow.rs parity: agents,
shared memory with priority eviction, thoughts + context eviction,
tool calls, sequential workflows, events, and the catalog search
bridge."""

import json

import pytest

from needle_spark.catalog import Collection
from needle_spark.operators.agentic_workflow import (
    COMPLETED,
    IDLE,
    PENDING,
    RUNNING,
    WORKING,
    WorkflowConfig,
    WorkflowEngine,
    WorkflowError,
    WorkflowStep,
)


def test_register_agents_and_status():
    eng = WorkflowEngine()
    a = eng.register_agent("researcher", 4096, now=1)
    b = eng.register_agent("writer", now=2)  # default context window
    assert (a, b) == ("agent-0001", "agent-0002")
    assert eng.agent(a).role == "researcher"
    assert eng.agent(b).context_window == 8192
    assert eng.agent(a).status == IDLE
    eng.set_agent_status(a, WORKING, now=3)
    assert eng.agent(a).status == WORKING
    assert eng.agent_count == 2 and eng.stats.active_agents == 2
    with pytest.raises(WorkflowError, match="not found"):
        eng.set_agent_status("agent-9999", IDLE)
    capped = WorkflowEngine(WorkflowConfig(max_agents=1))
    capped.register_agent("only")
    with pytest.raises(WorkflowError, match="Maximum agents"):
        capped.register_agent("too-many")


def test_shared_memory_cross_agent():
    eng = WorkflowEngine()
    a = eng.register_agent("researcher")
    b = eng.register_agent("writer")
    eng.write_shared_memory(a, "findings", "Vector DBs are fast", now=10)
    assert eng.read_shared_memory(b, "findings") == "Vector DBs are fast"
    entry = eng.shared_memory["findings"]
    assert entry.written_by == a and entry.access_count == 1
    assert eng.stats.total_memory_writes == 1
    assert eng.stats.total_memory_reads == 1
    with pytest.raises(WorkflowError, match="Memory key"):
        eng.read_shared_memory(a, "nothing")


def test_shared_memory_priority_eviction():
    eng = WorkflowEngine(WorkflowConfig(max_shared_memory=2))
    a = eng.register_agent("x")
    eng.write_shared_memory(a, "keep", "v1")
    eng.set_memory_priority("keep", 10)
    eng.write_shared_memory(a, "low", "v2")  # priority 1
    eng.write_shared_memory(a, "new", "v3")  # evicts "low"
    assert set(eng.shared_memory) == {"keep", "new"}
    # overwriting an existing key never evicts
    eng.write_shared_memory(a, "keep", "v1b")
    assert set(eng.shared_memory) == {"keep", "new"}


def test_thoughts_and_context_eviction():
    eng = WorkflowEngine(WorkflowConfig(context_eviction_threshold=0.5))
    a = eng.register_agent("thinker", context_window=100)  # threshold 50
    for i in range(6):
        eng.add_thought(a, "t" * 40, action="act", observation="obs")
    ag = eng.agent(a)
    assert eng.stats.total_context_evictions >= 1
    assert len(ag.thought_chain) < 6  # oldest third dropped
    assert ag.thought_chain[0].thought == "t" * 40
    assert eng.stats.total_thoughts == 6


def test_tool_call_tracking():
    eng = WorkflowEngine()
    a = eng.register_agent("caller")
    eng.record_tool_call(a, "search", {"q": "x"}, {"hits": 3},
                         duration_ms=12, success=True, now=5)
    ag = eng.agent(a)
    assert ag.tool_calls[0].tool == "search"
    assert ag.tool_calls[0].duration_ms == 12
    assert ag.context_used == 100
    assert eng.stats.total_tool_calls == 1
    ev = eng.agent_events(a)
    assert ev[-1]["event_type"] == "tool_call_end"
    assert ev[-1]["data"]["success"] is True


def test_workflow_lifecycle():
    eng = WorkflowEngine()
    a = eng.register_agent("worker")
    steps = [
        WorkflowStep("plan", a, "execute", {"prompt": "make a plan"}),
        WorkflowStep("lookup", a, "search", {"query": [1.0], "k": 3}),
        WorkflowStep("save", a, "store", {"key": "out", "value": "done"}),
    ]
    wf_id = eng.create_workflow("pipeline", steps, now=100)
    assert wf_id == "wf-0001"
    wf = eng.workflow(wf_id)
    assert wf.status == "created" and wf.steps[0].status == PENDING

    nxt = eng.advance_workflow(wf_id, now=101)  # completes plan
    assert nxt.name == "lookup" and nxt.status == RUNNING
    assert wf.steps[0].status == COMPLETED
    nxt = eng.advance_workflow(wf_id, now=102)
    assert nxt.name == "save"
    assert eng.advance_workflow(wf_id, now=103) is None  # finished
    assert wf.status == COMPLETED and wf.completed_at == 103
    with pytest.raises(WorkflowError, match="already"):
        eng.advance_workflow(wf_id)
    kinds = [e["event_type"] for e in eng.workflow_events(wf_id)]
    assert kinds[0] == "workflow_created"
    assert kinds[-1] == "workflow_completed"
    assert kinds.count("step_completed") == 3


def test_workflow_capacity_and_bad_step():
    eng = WorkflowEngine(WorkflowConfig(max_workflows=1))
    a = eng.register_agent("x")
    eng.create_workflow("one", [WorkflowStep("s", a, "execute")])
    with pytest.raises(WorkflowError, match="Maximum workflows"):
        eng.create_workflow("two", [])
    with pytest.raises(WorkflowError, match="step_type"):
        WorkflowStep("bad", a, "teleport")


def test_event_log_bounded():
    eng = WorkflowEngine(WorkflowConfig(max_events=3))
    a = eng.register_agent("x")
    for i in range(5):
        eng.write_shared_memory(a, f"k{i}", "v")
    assert len(eng.events) == 3
    assert eng.events[-1]["data"]["key"] == "k4"


def test_search_step_bridge(spark, tmp_path):
    coll = Collection.create(spark, str(tmp_path / "c"), dims=2)
    coll.insert(spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [0.9, 0.1])],
        "id string, vector array<float>"))
    eng = WorkflowEngine()
    agent = eng.register_agent("retriever")
    wf_id = eng.create_workflow("rag", [
        WorkflowStep("retrieve", agent, "search",
                     {"query": [1.0, 0.0], "k": 2}),
    ])
    rows = eng.run_search_step(wf_id, coll, now=7)
    assert [r["id"] for r in rows] == ["a", "c"]
    # result ids in shared memory + recorded as a tool call
    assert json.loads(eng.read_shared_memory(agent, "retrieve")) == ["a", "c"]
    assert eng.agent(agent).tool_calls[0].tool == "vector_search"
    # a non-search step refuses the bridge
    wf2 = eng.create_workflow("other", [
        WorkflowStep("exec", agent, "execute", {"prompt": "hi"})])
    with pytest.raises(WorkflowError, match="not search"):
        eng.run_search_step(wf2, coll)
