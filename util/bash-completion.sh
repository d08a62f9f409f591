#!/bin/bash
# Bash completion for the plass / penguin CLIs, driven by the binaries'
# own `shellcompletion` tool (reference: lib/mmseqs/util/bash-completion.sh
# + Application.cpp:124-182).  Install with
#   source PLASS_TPU_HOME/util/bash-completion.sh
# and keep plass/penguin (bin/) on $PATH.
_plass_tpu_complete() {
	local cur bin
	COMPREPLY=()
	bin="${COMP_WORDS[0]}"
	cur="${COMP_WORDS[COMP_CWORD]}"

	if [[ ${COMP_CWORD} -eq 1 ]] ; then
		COMPREPLY=( $(LC_COLLATE=C compgen -W "$("${bin}" shellcompletion 2> /dev/null)" -- "${cur}") )
		return 0
	fi

	if [[ ${COMP_CWORD} -gt 1 ]] ; then
		COMPREPLY=( $(LC_COLLATE=C compgen -f -W "$("${bin}" shellcompletion "${COMP_WORDS[1]}" 2> /dev/null)" -- "${cur}") )
		return 0
	fi
}
complete -o plusdirs -F _plass_tpu_complete plass
complete -o plusdirs -F _plass_tpu_complete penguin
