"""Named LLM-tool plugin registry.

Parity surface for the reference's ``GlobalPluginManager``
(generate.py:26,34,152-158): Generate nodes select tools BY NAME
(``llm_enabled_tools``), the manager resolves
``get_llm_tool_by_name`` / ``get_llm_tools_by_names``, each tool
exposes ``get_metadata()`` (converted to an OpenAI tool schema by
``llm_tool_metadata_to_openai_tool``) and instances run via
``invoke(**arguments)``; a ``ToolCallSession`` dispatches a model's
tool call by name and raises ``ValueError`` for unknown tools
(generate.py:33-38). The reference's plugin package is not in the
checkout — only this call surface is, so the engine re-expresses
exactly that surface.

Engine posture: tools are plain classes registered with
``@register_llm_tool``; a stage resolves its enabled tools ONCE per
actor (the stateful ``__init__`` slot) and fails loudly at
construction on unknown names. Two deterministic built-ins ship so the
registry is usable (and testable) offline; a real deployment registers
model/API-backed tools the same way.
"""

from __future__ import annotations

__all__ = [
    "GLOBAL_PLUGINS",
    "LLMToolPlugin",
    "PluginCallSession",
    "PluginManager",
    "llm_tool_metadata_to_openai_tool",
    "register_llm_tool",
]


class LLMToolPlugin:
    """Base: subclasses set ``name`` / ``description`` / ``parameters``
    (a {param: {"type", "description"}} dict) and implement
    ``invoke(**kwargs) -> str``."""

    name: str = ""
    description: str = ""
    parameters: dict = {}

    @classmethod
    def get_metadata(cls) -> dict:
        return {"name": cls.name, "description": cls.description,
                "parameters": dict(cls.parameters)}

    def invoke(self, **kwargs) -> str:
        raise NotImplementedError


def llm_tool_metadata_to_openai_tool(meta: dict) -> dict:
    """Tool metadata -> OpenAI function-tool schema (the shape the
    reference binds to its chat model, generate.py:156-158)."""
    return {
        "type": "function",
        "function": {
            "name": meta["name"],
            "description": meta.get("description", ""),
            "parameters": {
                "type": "object",
                "properties": dict(meta.get("parameters", {})),
                "required": sorted(meta.get("parameters", {})),
            },
        },
    }


class PluginManager:
    def __init__(self) -> None:
        self._tools: dict[str, type[LLMToolPlugin]] = {}

    def register(self, cls: type[LLMToolPlugin]) -> type[LLMToolPlugin]:
        if not cls.name:
            raise ValueError(f"{cls.__name__} has no tool name")
        self._tools[cls.name] = cls
        return cls

    def get_llm_tool_by_name(self, name: str) -> type[LLMToolPlugin] | None:
        return self._tools.get(name)

    def get_llm_tools_by_names(
            self, names: list[str]) -> list[type[LLMToolPlugin]]:
        """Resolved tool classes for the known names, reference
        semantics (unknown names resolve to nothing here; DISPATCH of
        an unknown name is the loud failure, PluginCallSession)."""
        out = []
        for n in names:
            t = self._tools.get(n)
            if t is not None:
                out.append(t)
        return out

    def names(self) -> list[str]:
        return sorted(self._tools)


GLOBAL_PLUGINS = PluginManager()


def register_llm_tool(cls: type[LLMToolPlugin]) -> type[LLMToolPlugin]:
    """Class decorator: add a tool to the global registry."""
    return GLOBAL_PLUGINS.register(cls)


class PluginCallSession:
    """Dispatch a model's tool call by name — the engine's
    ``LLMToolPluginCallSession`` (generate.py:33-38), same ValueError
    contract for unknown tools."""

    def tool_call(self, name: str, arguments: dict) -> str:
        tool = GLOBAL_PLUGINS.get_llm_tool_by_name(name)
        if tool is None:
            raise ValueError(f"LLM tool {name} does not exist")
        return str(tool().invoke(**arguments))


# ---- deterministic built-ins (offline doubles a test graph can bind) ----


@register_llm_tool
class WordCountTool(LLMToolPlugin):
    name = "word_count"
    description = "Count whitespace-separated words in the text."
    parameters = {"text": {"type": "string",
                           "description": "text to count"}}

    def invoke(self, text: str = "") -> str:
        return str(len((text or "").split()))


@register_llm_tool
class KeywordTool(LLMToolPlugin):
    name = "extract_keywords"
    description = "Top-n frequent lowercase tokens of the text."
    parameters = {"text": {"type": "string", "description": "source"},
                  "top_n": {"type": "integer", "description": "how many"}}

    def invoke(self, text: str = "", top_n: int = 3) -> str:
        from collections import Counter

        top = Counter((text or "").lower().split()).most_common(int(top_n))
        return " ".join(w for w, _ in top)
