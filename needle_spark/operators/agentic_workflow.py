"""Agentic workflow engine: multi-agent shared memory, sequential
workflow primitives, chain-of-thought memory, tool-use tracking,
context-window eviction, and an event stream.

Reference: /root/reference/src/services/ai/agentic_workflow.rs —
Agent/AgentStatus (:42-70), ToolCall (:73-87, ~100-token context
estimate per call :372), ThoughtEntry (:90-104, len/4 token estimate
:417), SharedMemoryEntry (:107-123), Workflow/WorkflowStep/StepType
(:126-177: execute/search/store/condition/wait/fan_out),
Step/Workflow status (:179-198), WorkflowEvent/EventType (:201-233),
WorkflowConfig (:236-263: 64 agents, 10k memory, 100k events, 8192
ctx, 0.9 eviction threshold, 100 workflows), EngineStats (:266-276),
WorkflowEngine (:279-700): register_agent "agent-NNNN" (:308-331),
record_tool_call (:353-388), add_thought (:390-421),
write_shared_memory with lowest-priority eviction at capacity
(:424-466), read_shared_memory bumps access_count (:468-486),
create_workflow "wf-NNNN" (:504-531), advance_workflow = complete
current, start next, finish at the end (:534-608),
check_context_eviction drops the oldest third of the thought chain
(:612-660 area).

Altitude: the engine is coordination state — O(agents + steps), plain
driver-side Python, exactly like the reference (no Spark job should
ever run per thought).  The bridge to the distributed engine is
`run_search_step`, which executes a Search step as the catalog's
exact-kNN plan and writes the result ids into shared memory."""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

IDLE = "idle"
WORKING = "working"
WAITING_FOR_INPUT = "waiting_for_input"
COMPLETED = "completed"
FAILED = "failed"

PENDING = "pending"
RUNNING = "running"
SKIPPED = "skipped"

CREATED = "created"
PAUSED = "paused"

STEP_TYPES = ("execute", "search", "store", "condition", "wait_for_input",
              "fan_out")


class WorkflowError(ValueError):
    pass


@dataclass
class ToolCall:
    tool: str
    input: dict
    output: dict | None
    timestamp: int
    duration_ms: int
    success: bool


@dataclass
class ThoughtEntry:
    step: int
    thought: str
    action: str | None
    observation: str | None
    timestamp: int


@dataclass
class Agent:
    id: str
    role: str
    context_window: int
    context_used: int = 0
    status: str = IDLE
    registered_at: int = 0
    tool_calls: list[ToolCall] = field(default_factory=list)
    thought_chain: list[ThoughtEntry] = field(default_factory=list)


@dataclass
class SharedMemoryEntry:
    key: str
    value: str
    written_by: str
    written_at: int
    access_count: int = 0
    priority: int = 1


@dataclass
class WorkflowStep:
    """agentic_workflow.rs:145-177."""

    name: str
    agent_id: str
    step_type: str
    params: dict = field(default_factory=dict)
    status: str = PENDING
    output: str | None = None
    depends_on: tuple[int, ...] = ()

    def __post_init__(self):
        if self.step_type not in STEP_TYPES:
            raise WorkflowError(
                f"step_type must be one of {STEP_TYPES}")


@dataclass
class Workflow:
    id: str
    name: str
    steps: list[WorkflowStep]
    current_step: int = 0
    status: str = CREATED
    created_at: int = 0
    completed_at: int | None = None


@dataclass
class WorkflowConfig:
    """agentic_workflow.rs:236-263."""

    max_agents: int = 64
    max_shared_memory: int = 10_000
    max_events: int = 100_000
    default_context_window: int = 8192
    context_eviction_threshold: float = 0.9
    max_workflows: int = 100


@dataclass
class EngineStats:
    total_tool_calls: int = 0
    total_thoughts: int = 0
    total_memory_writes: int = 0
    total_memory_reads: int = 0
    total_context_evictions: int = 0
    active_agents: int = 0
    active_workflows: int = 0


class WorkflowEngine:
    """agentic_workflow.rs:279-700."""

    def __init__(self, config: WorkflowConfig | None = None):
        self.config = config or WorkflowConfig()
        self.agents: dict[str, Agent] = {}
        self.shared_memory: dict[str, SharedMemoryEntry] = {}
        self.workflows: dict[str, Workflow] = {}
        self.events: list[dict] = []
        self.stats = EngineStats()
        self._next_agent = 1
        self._next_workflow = 1

    def _now(self, now: int | None) -> int:
        return int(time.time()) if now is None else now

    def _event(self, event_type: str, agent_id=None, workflow_id=None,
               data=None, now=None):
        if len(self.events) >= self.config.max_events:
            self.events.pop(0)
        self.events.append({
            "event_type": event_type, "agent_id": agent_id,
            "workflow_id": workflow_id, "data": data or {},
            "timestamp": self._now(now),
        })

    # -- agents --

    def register_agent(self, role: str, context_window: int = 0,
                       *, now: int | None = None) -> str:
        """agentic_workflow.rs:308-331."""
        if len(self.agents) >= self.config.max_agents:
            raise WorkflowError(
                f"Maximum agents ({self.config.max_agents}) reached")
        agent_id = f"agent-{self._next_agent:04d}"
        self._next_agent += 1
        self.agents[agent_id] = Agent(
            id=agent_id, role=role,
            context_window=(context_window
                            or self.config.default_context_window),
            registered_at=self._now(now))
        self.stats.active_agents += 1
        self._event("agent_registered", agent_id, data={"role": role},
                    now=now)
        return agent_id

    def agent(self, agent_id: str) -> Agent | None:
        return self.agents.get(agent_id)

    def _require_agent(self, agent_id: str) -> Agent:
        a = self.agents.get(agent_id)
        if a is None:
            raise WorkflowError(f"Agent {agent_id!r} not found")
        return a

    def set_agent_status(self, agent_id: str, status: str,
                         *, now: int | None = None) -> None:
        a = self._require_agent(agent_id)
        a.status = status
        self._event("agent_status_change", agent_id,
                    data={"status": status}, now=now)

    # -- tool calls & thoughts --

    def record_tool_call(self, agent_id: str, tool: str, input: dict,
                         output: dict | None = None, duration_ms: int = 0,
                         success: bool = True,
                         *, now: int | None = None) -> None:
        """agentic_workflow.rs:353-388 — ~100-token context estimate."""
        a = self._require_agent(agent_id)
        a.tool_calls.append(ToolCall(tool, input, output, self._now(now),
                                     duration_ms, success))
        a.context_used += 100
        self.stats.total_tool_calls += 1
        self._event("tool_call_end", agent_id,
                    data={"tool": tool, "success": success,
                          "duration_ms": duration_ms}, now=now)
        self._check_eviction(agent_id, now)

    def add_thought(self, agent_id: str, thought: str,
                    action: str | None = None,
                    observation: str | None = None,
                    *, now: int | None = None) -> None:
        """agentic_workflow.rs:390-421 — len/4 token estimate."""
        a = self._require_agent(agent_id)
        a.thought_chain.append(ThoughtEntry(
            len(a.thought_chain) + 1, thought, action, observation,
            self._now(now)))
        a.context_used += len(thought) // 4
        self.stats.total_thoughts += 1
        self._event("thought_added", agent_id,
                    data={"step": len(a.thought_chain)}, now=now)
        self._check_eviction(agent_id, now)

    def _check_eviction(self, agent_id: str, now=None) -> None:
        """Drop the oldest third of the thought chain past the
        threshold — agentic_workflow.rs:612+."""
        a = self.agents[agent_id]
        threshold = int(a.context_window
                        * self.config.context_eviction_threshold)
        if a.context_used > threshold:
            n = len(a.thought_chain) // 3
            if n > 0:
                evicted = a.thought_chain[:n]
                a.thought_chain = a.thought_chain[n:]
                a.context_used -= sum(
                    len(t.thought) // 4 for t in evicted)
                self.stats.total_context_evictions += 1
                self._event("context_eviction", agent_id,
                            data={"evicted": n}, now=now)

    # -- shared memory --

    def write_shared_memory(self, agent_id: str, key: str, value: str,
                            *, now: int | None = None) -> None:
        """agentic_workflow.rs:424-466 — at capacity, the
        lowest-priority entry is evicted."""
        self._require_agent(agent_id)
        if (len(self.shared_memory) >= self.config.max_shared_memory
                and key not in self.shared_memory):
            lowest = min(self.shared_memory.values(),
                         key=lambda e: e.priority)
            del self.shared_memory[lowest.key]
        self.shared_memory[key] = SharedMemoryEntry(
            key, value, agent_id, self._now(now))
        self.stats.total_memory_writes += 1
        self._event("memory_write", agent_id, data={"key": key}, now=now)

    def read_shared_memory(self, agent_id: str, key: str,
                           *, now: int | None = None) -> str:
        """agentic_workflow.rs:468-486."""
        self._require_agent(agent_id)
        entry = self.shared_memory.get(key)
        if entry is None:
            raise WorkflowError(f"Memory key {key!r} not found")
        entry.access_count += 1
        self.stats.total_memory_reads += 1
        self._event("memory_read", agent_id, data={"key": key}, now=now)
        return entry.value

    def list_shared_memory(self) -> list[SharedMemoryEntry]:
        return list(self.shared_memory.values())

    def set_memory_priority(self, key: str, priority: int) -> None:
        entry = self.shared_memory.get(key)
        if entry is None:
            raise WorkflowError(f"Memory key {key!r} not found")
        entry.priority = priority

    # -- workflows --

    def create_workflow(self, name: str, steps: list[WorkflowStep],
                        *, now: int | None = None) -> str:
        """agentic_workflow.rs:504-531."""
        if len(self.workflows) >= self.config.max_workflows:
            raise WorkflowError(
                f"Maximum workflows ({self.config.max_workflows}) reached")
        wf_id = f"wf-{self._next_workflow:04d}"
        self._next_workflow += 1
        self.workflows[wf_id] = Workflow(
            wf_id, name, list(steps), created_at=self._now(now))
        self.stats.active_workflows += 1
        self._event("workflow_created", workflow_id=wf_id,
                    data={"name": name}, now=now)
        return wf_id

    def advance_workflow(self, workflow_id: str,
                         *, now: int | None = None) -> WorkflowStep | None:
        """agentic_workflow.rs:534-608: complete the current step,
        start the next, None when finished."""
        wf = self.workflows.get(workflow_id)
        if wf is None:
            raise WorkflowError(f"Workflow {workflow_id!r} not found")
        if wf.status in (COMPLETED, FAILED):
            raise WorkflowError(
                f"Workflow {workflow_id!r} is already {wf.status}")
        wf.status = RUNNING
        if wf.current_step < len(wf.steps):
            wf.steps[wf.current_step].status = COMPLETED
            self._event("step_completed", workflow_id=workflow_id,
                        data={"step": wf.current_step}, now=now)
            wf.current_step += 1
        if wf.current_step >= len(wf.steps):
            wf.status = COMPLETED
            wf.completed_at = self._now(now)
            self.stats.active_workflows = max(
                0, self.stats.active_workflows - 1)
            self._event("workflow_completed", workflow_id=workflow_id,
                        now=now)
            return None
        nxt = wf.steps[wf.current_step]
        nxt.status = RUNNING
        self._event("step_started", workflow_id=workflow_id,
                    data={"step": wf.current_step}, now=now)
        return nxt

    def workflow(self, workflow_id: str) -> Workflow | None:
        return self.workflows.get(workflow_id)

    def list_workflows(self) -> list[Workflow]:
        return list(self.workflows.values())

    # -- events --

    def agent_events(self, agent_id: str) -> list[dict]:
        return [e for e in self.events if e["agent_id"] == agent_id]

    def workflow_events(self, workflow_id: str) -> list[dict]:
        return [e for e in self.events if e["workflow_id"] == workflow_id]

    @property
    def agent_count(self) -> int:
        return len(self.agents)

    # -- distributed bridge --

    def run_search_step(self, workflow_id: str, collection,
                        *, query_vector=None, now: int | None = None) -> list:
        """Execute the CURRENT step (must be a Search step) as the
        catalog's exact-kNN plan, record it as a tool call, and write
        the result ids into shared memory under the step name."""
        from needle_spark.operators.knn import knn

        wf = self.workflows.get(workflow_id)
        if wf is None:
            raise WorkflowError(f"Workflow {workflow_id!r} not found")
        step = wf.steps[wf.current_step]
        if step.step_type != "search":
            raise WorkflowError(
                f"current step {step.name!r} is {step.step_type}, not search")
        qv = query_vector if query_vector is not None else step.params["query"]
        k = int(step.params.get("k", 10))
        t0 = time.monotonic()
        rows = knn(collection.df(), list(qv), k=k,
                   vector_col=collection.vector_col,
                   id_col=collection.id_col).collect()
        ids = [r[collection.id_col] for r in rows]
        self.record_tool_call(
            step.agent_id, "vector_search",
            {"k": k}, {"ids": [str(i) for i in ids]},
            duration_ms=int((time.monotonic() - t0) * 1000),
            success=True, now=now)
        self.write_shared_memory(step.agent_id, step.name,
                                 json.dumps([str(i) for i in ids]), now=now)
        step.output = json.dumps([str(i) for i in ids])
        return rows
