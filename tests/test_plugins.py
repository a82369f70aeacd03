"""Plugin LLM-tool registry parity (reference GlobalPluginManager
surface, generate.py:26,34,152-158). No Ray needed."""

import pytest


class TestRegistry:
    def test_builtins_registered_and_resolvable(self):
        from raydoc.plugins import GLOBAL_PLUGINS

        assert "word_count" in GLOBAL_PLUGINS.names()
        t = GLOBAL_PLUGINS.get_llm_tool_by_name("word_count")
        assert t is not None and t().invoke(text="a b  c") == "3"

    def test_by_names_resolves_known_skips_unknown(self):
        from raydoc.plugins import GLOBAL_PLUGINS

        tools = GLOBAL_PLUGINS.get_llm_tools_by_names(
            ["word_count", "nope", "extract_keywords"])
        assert [t.name for t in tools] == ["word_count",
                                           "extract_keywords"]
        assert GLOBAL_PLUGINS.get_llm_tool_by_name("nope") is None

    def test_register_decorator_and_metadata(self):
        from raydoc.plugins import (GLOBAL_PLUGINS, LLMToolPlugin,
                                    register_llm_tool)

        @register_llm_tool
        class Shout(LLMToolPlugin):
            name = "shout_test_tool"
            description = "upper-case the text"
            parameters = {"text": {"type": "string",
                                   "description": "input"}}

            def invoke(self, text: str = "") -> str:
                return text.upper()

        meta = Shout.get_metadata()
        assert meta == {"name": "shout_test_tool",
                        "description": "upper-case the text",
                        "parameters": {"text": {"type": "string",
                                                "description": "input"}}}
        assert GLOBAL_PLUGINS.get_llm_tool_by_name(
            "shout_test_tool")().invoke(text="hi") == "HI"

    def test_nameless_plugin_rejected(self):
        from raydoc.plugins import LLMToolPlugin, PluginManager

        class NoName(LLMToolPlugin):
            pass

        with pytest.raises(ValueError):
            PluginManager().register(NoName)

    def test_openai_tool_schema_shape(self):
        """llm_tool_metadata_to_openai_tool parity: the function-tool
        envelope the reference binds to its chat model."""
        from raydoc.plugins import (GLOBAL_PLUGINS,
                                    llm_tool_metadata_to_openai_tool)

        meta = GLOBAL_PLUGINS.get_llm_tool_by_name(
            "extract_keywords").get_metadata()
        tool = llm_tool_metadata_to_openai_tool(meta)
        assert tool["type"] == "function"
        fn = tool["function"]
        assert fn["name"] == "extract_keywords"
        assert fn["parameters"]["type"] == "object"
        assert set(fn["parameters"]["properties"]) == {"text", "top_n"}
        assert fn["parameters"]["required"] == ["text", "top_n"]


class TestCallSession:
    def test_dispatch_by_name(self):
        from raydoc.plugins import PluginCallSession

        s = PluginCallSession()
        assert s.tool_call("word_count", {"text": "x y"}) == "2"
        assert s.tool_call("extract_keywords",
                           {"text": "a a b", "top_n": 1}) == "a"

    def test_unknown_tool_valueerror(self):
        """generate.py:36-37: unknown tool at DISPATCH is the loud
        failure."""
        from raydoc.plugins import PluginCallSession

        with pytest.raises(ValueError, match="does not exist"):
            PluginCallSession().tool_call("missing_tool", {})


@pytest.mark.usefixtures("ray_session")
class TestGenerateStageTools:
    def test_enabled_tools_run_per_row(self):
        """GenerateStage(enabled_tools=...) resolves the named tools
        once in __init__ (per-actor slot) and the deterministic double
        appends each tool's output — the batch equivalent of the
        reference binding llm_enabled_tools to the chat model."""
        import pyarrow as pa

        from raydoc.pipelines.conformance import GenerateStage

        st = GenerateStage(prompt="A: {input}",
                           enabled_tools=["word_count",
                                          "extract_keywords"])
        out = st(pa.table({"input": ["ray data ray", ""]}))
        a0, a1 = out.column("answer").to_pylist()
        assert a0.startswith("A: ray data ray")
        assert "[tool:word_count] 3" in a0
        assert "[tool:extract_keywords] ray" in a0
        assert "[tool:word_count] 0" in a1

    def test_unknown_enabled_tool_fails_at_construction(self):
        from raydoc.pipelines.conformance import GenerateStage

        with pytest.raises(ValueError, match="unknown LLM tool"):
            GenerateStage(enabled_tools=["word_count", "bogus"])
