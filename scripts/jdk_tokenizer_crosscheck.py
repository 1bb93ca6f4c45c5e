"""Cross-validate astrospark.analyzer.tokenize against the ACTUAL Java
semantics the reference uses: ``java.util.StringTokenizer(text, DELIMITERS,
true)`` + the letter/digit split regex
(/root/reference/src/main/java/org/grobid/core/analyzers/AstroAnalyzer.java:44-80).

Generates a tiny Java twin (delimiter string transcribed as \\u escapes so
every character is auditable), compiles it with the JDK that ships for
Spark, and diffs token lists over a fuzz corpus of delimiter soup,
digit-glue cases, and gazetteer names. This pins the semantics to the real
JDK class rather than to our own re-reading of its javadoc.

Run: python scripts/jdk_tokenizer_crosscheck.py   (exit 0 = all match)
Last recorded run: 20948 cases, 0 mismatches; a separate 8000-case
non-BMP campaign (math-alphanumerics, emoji, CJK ext-B) also matched —
surrogate pairs survive StringTokenizer intact and the ASCII-only
letter/digit lookarounds agree across UTF-16 units vs code points.
Known representational difference (not a token-content difference): the
engine's char OFFSETS count code points where Java's would count UTF-16
units; they diverge only on documents containing astral-plane chars.
"""

from __future__ import annotations

import base64
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# exact transcription of AstroAnalyzer.java:44-54
_DELIMS_JAVA = (
    '" \\n\\r\\t([^%\\u2030\\u00B0,:;?.!/)-\\u2013\\u2212=\\u2248<>+\\"'
    "\\u201C\\u201D\\u2018\\u2019'`$]*"
    '\\u2666\\u2665\\u2663\\u2660\\u00A0"\n'
    '        + "\\u002D\\u2010\\u2011\\u2012\\u2013\\u2014\\u2015\\u207B\\u208B\\u2212"\n'
    '        + "\\u0096\\u058A\\u2043\\uFE58\\uFE63\\uFF0D"\n'
    '        + "\\u002B"\n'
    '        + "\\u002E\\u2024\\u2027\\u2219\\uFE52"\n'
    '        + "\\u0027\\u2032\\uFF07"\n'
    '        + "\\u003C"\n'
    '        + "\\u003D"\n'
    '        + "\\u003E"\n'
    '        + "\\u0020\\u00A0\\u2000\\u2001\\u2002\\u2003\\u2004\\u2005\\u2006\\u2007"\n'
    '        + "\\u2008\\u2009\\u200A\\u202F\\u205F\\u3000\\uF0A0"'
)

_JAVA_SRC = r'''
import java.util.*;
import java.io.*;

public class RefTok {
    public static final String DELIMITERS = %s;
    private static final String REGEX = "(?<=[a-zA-Z])(?=\\d)|(?<=\\d)(?=\\D)";

    public static void main(String[] args) throws Exception {
        BufferedReader br = new BufferedReader(new InputStreamReader(System.in, "UTF-8"));
        PrintStream out = new PrintStream(System.out, true, "UTF-8");
        Base64.Decoder dec = Base64.getDecoder();
        Base64.Encoder enc = Base64.getEncoder();
        String line;
        while ((line = br.readLine()) != null) {
            String text = new String(dec.decode(line), "UTF-8");
            List<String> result = new ArrayList<>();
            StringTokenizer st = new StringTokenizer(text, DELIMITERS, true);
            while (st.hasMoreTokens()) {
                String token = st.nextToken();
                String[] subtokens = token.split(REGEX);
                for (int i = 0; i < subtokens.length; i++) result.add(subtokens[i]);
            }
            StringBuilder sb = new StringBuilder();
            for (int i = 0; i < result.size(); i++) {
                if (i > 0) sb.append('\u001F');
                sb.append(result.get(i));
            }
            out.println(enc.encodeToString(sb.toString().getBytes("UTF-8")));
        }
    }
}
''' % _DELIMS_JAVA


def main() -> int:
    from astrospark.analyzer import DELIMITERS, tokenize
    from astrospark.lexicon import load_names

    java_home = os.environ.get("JAVA_HOME")
    if not java_home:
        print("SKIP: JAVA_HOME not set")
        return 0
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "RefTok.java")
        open(src, "w").write(_JAVA_SRC)
        subprocess.run(
            [os.path.join(java_home, "bin", "javac"), src], check=True, cwd=td
        )

        names = load_names()
        rng = random.Random(4242)
        alpha = (
            list("abcXYZ019 .,-()[]\"'`/+=<>!?;:%$^*")
            + ["\u03c3", "\u2013", "\u00a0", "\n", "\t", "\u2030", "\u00b0",
               "\u2248", "\u65e5", "\u2666", "\u2032", "\uff0d", "\u3000",
               "M4", "4\u03c3", "GRB", "x9y", "9.5", "a1b2"]
            + list(DELIMITERS)
        )
        cases = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
                 for _ in range(20000)]
        for nm in rng.sample(names, min(3000, len(names))):
            cases.append(nm)
            cases.append("see " + nm + " at 3 GHz.")

        inp = "\n".join(base64.b64encode(c.encode()).decode() for c in cases)
        p = subprocess.run(
            [os.path.join(java_home, "bin", "java"), "-cp", td, "RefTok"],
            input=inp, capture_output=True, text=True, timeout=600,
        )
        lines = p.stdout.splitlines()
        assert len(lines) == len(cases), (len(lines), len(cases), p.stderr[:500])
        mism = 0
        for c, l in zip(cases, lines):
            j = base64.b64decode(l).decode()
            jlist = j.split("\x1f") if j else []
            if jlist != tokenize(c):
                mism += 1
                if mism <= 5:
                    print("MISMATCH", repr(c), jlist[:8], tokenize(c)[:8])
        print(f"cases: {len(cases)} mismatches: {mism}")
        return 1 if mism else 0


if __name__ == "__main__":
    raise SystemExit(main())
